from .diagnostics import effective_sample_size, split_rhat
from .hmc import hmc_sample, HMCConfig
from .nuts import nuts_sample, NUTSConfig
from .smc import smc_sample, SMCConfig
from .toy_model import toy_joint_log_prob, toy_posterior_sampler

__all__ = [
    "effective_sample_size",
    "split_rhat",
    "hmc_sample",
    "HMCConfig",
    "nuts_sample",
    "NUTSConfig",
    "smc_sample",
    "SMCConfig",
    "toy_joint_log_prob",
    "toy_posterior_sampler",
]
