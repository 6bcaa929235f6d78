from sigman_release_tpu.training.checkpoint import (
    save_checkpoint,
    load_checkpoint,
    tolerant_restore,
)
from sigman_release_tpu.training.vae_trainer import VAETrainer
from sigman_release_tpu.training.dit_trainer import DiTTrainer
