from .distributions import (
    Beta,
    Dirichlet,
    DirichletMixture,
    Normal,
    Poisson,
    TruncatedNormal,
    kl_divergence,
    positive_range,
)
from .bijectors import IteratedSigmoidCentered

__all__ = [
    "Normal",
    "TruncatedNormal",
    "Beta",
    "Poisson",
    "Dirichlet",
    "DirichletMixture",
    "kl_divergence",
    "positive_range",
    "IteratedSigmoidCentered",
]
