from sigman_release_tpu.ops.rasterizer.preprocess import (
    build_cov3d,
    project_gaussians,
)
from sigman_release_tpu.ops.rasterizer.reference import render_dense
from sigman_release_tpu.ops.rasterizer.render import (
    RasterizeConfig,
    rasterize,
    rasterize_single,
)
