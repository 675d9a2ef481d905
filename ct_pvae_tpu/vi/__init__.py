from .loss import elbo_loss, physics_log_likelihood
from .train import Trainer, TrainState

__all__ = ["elbo_loss", "physics_log_likelihood", "Trainer", "TrainState"]
