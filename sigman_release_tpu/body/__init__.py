from sigman_release_tpu.body.lbs import lbs, batch_rigid_transform, blend_shapes
from sigman_release_tpu.body.smplx import (
    SMPLXModel,
    SMPLXParams,
    load_smplx_npz,
    synthetic_body_model,
    smplx_forward,
)
from sigman_release_tpu.body.deformer import GaussianDeformer, DeformerState
from sigman_release_tpu.body.template import (
    TemplateAssets,
    load_template_dir,
    synthetic_template,
)
