from sigman_release_tpu.losses.lpips import LPIPS, load_lpips_params
from sigman_release_tpu.losses.gan import PatchDiscriminator, hinge_d_loss, hinge_g_loss
from sigman_release_tpu.losses.metrics import psnr, masked_psnr, ssim
from sigman_release_tpu.losses.combined import VAELoss
