from sigman_release_tpu.models.vae import ConvVAE, VAEModel, DiagonalGaussian
from sigman_release_tpu.models.dit import DiTModel
from sigman_release_tpu.models.render_head import RenderHead
