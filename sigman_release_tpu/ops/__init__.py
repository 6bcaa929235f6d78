from sigman_release_tpu.ops.rotations import (
    rodrigues,
    quaternion_to_matrix,
    matrix_to_quaternion,
)
from sigman_release_tpu.ops.grid_sample import grid_sample_2d, grid_sample_3d
from sigman_release_tpu.ops.knn import mean_knn_dist2, knn
