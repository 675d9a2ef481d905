from .pvae import Decoder, Encoder, build_models, latent_shapes

__all__ = ["Encoder", "Decoder", "build_models", "latent_shapes"]
