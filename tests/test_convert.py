"""Structural validation of the reference-checkpoint converter mapping."""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

import jax
import jax.numpy as jnp
import numpy as np

from sigman_release_tpu.config import PRESETS
from sigman_release_tpu.models.dit import DiTModel

from convert_reference_ckpt import convert_dit, dit_key_map

CFG = PRESETS["test_tiny"].replace(
    num_layers=2, num_attention_heads=2, attention_head_dim=8,
    text_embed_dim=16, time_embed_dim=16, sample_height=8, sample_width=8,
)


def _init_params():
    model = DiTModel(CFG)
    latent = jnp.zeros((1, CFG.in_channels, CFG.sample_height,
                        CFG.sample_width))
    cond = jnp.zeros((1, CFG.text_embed_dim, 16, 16))
    return model.init(jax.random.PRNGKey(0), latent, cond,
                      jnp.zeros((1,), jnp.int32))


def test_mapping_paths_exist():
    """Every flax path in the converter table must exist in a fresh model."""
    from flax.traverse_util import flatten_dict

    params = _init_params()
    flat = set(flatten_dict(params).keys())
    missing = [
        "/".join(fpath)
        for _t, (fpath, _f) in dit_key_map(CFG.num_layers).items()
        if fpath not in flat
    ]
    assert not missing, f"converter maps to nonexistent params: {missing[:10]}"


def test_convert_roundtrip_identity():
    """A synthetic torch state_dict built FROM the flax params converts back
    exactly (validates every transform's transposition rules)."""
    from flax.traverse_util import flatten_dict

    params = _init_params()
    flat = flatten_dict(params)
    sd = {}
    for tname, (fpath, tfm) in dit_key_map(CFG.num_layers).items():
        w = np.asarray(flat[fpath])
        if tfm.__name__ == "_t_linear":
            sd[tname] = w.T
        elif tfm.__name__ == "_t_conv":
            sd[tname] = w.transpose(3, 2, 0, 1)
        else:
            sd[tname] = w
    converted = convert_dit(sd, params, CFG.num_layers, verbose=False)
    cflat = flatten_dict(converted)
    for k, v in flat.items():
        np.testing.assert_array_equal(np.asarray(cflat[k]), np.asarray(v))
