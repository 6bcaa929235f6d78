from sigman_release_tpu.data.dataset import HGSDataset, SyntheticAvatarDataset
from sigman_release_tpu.data.loader import DataLoader, shard_for_host
from sigman_release_tpu.data.augment import grid_distortion, orbit_camera_jitter
