"""Tile-sharded filter pipeline on a virtual 8-device CPU mesh: result must
equal the single-device pass composition exactly."""
import numpy as np

import jax
import jax.numpy as jnp

from libde265_tpu.parallel import make_mesh, sharded_filter_pipeline
from libde265_tpu.ops.deblock import _luma_pass


def test_sharded_deblock_matches_single_device(native_build):
    n = 8
    assert len(jax.devices()) >= n, (
        "conftest must provide a virtual 8-device CPU platform; a smaller "
        "mesh would silently degenerate this test")
    mesh = make_mesh(n)
    H, W = 32 * n, 256
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.integers(0, 255, (H, W + 8), dtype=np.int32))
    Ev, Eh = W // 8, H // 8
    bs_v = jnp.asarray(rng.integers(0, 3, (H // 4, Ev), dtype=np.int32))
    beta_v = jnp.full((H // 4, Ev), 48, jnp.int32)
    tc_v = jnp.full((H // 4, Ev), 6, jnp.int32)
    z_v = jnp.zeros((H // 4, Ev), jnp.int32)
    bs_h = jnp.asarray(rng.integers(0, 3, ((W + 8) // 4, Eh), dtype=np.int32))
    beta_h = jnp.full(((W + 8) // 4, Eh), 48, jnp.int32)
    tc_h = jnp.full(((W + 8) // 4, Eh), 6, jnp.int32)
    z_h = jnp.zeros(((W + 8) // 4, Eh), jnp.int32)

    with mesh:
        fn = sharded_filter_pipeline(mesh)
        sharded = np.asarray(fn(img, bs_v, beta_v, tc_v, z_v, z_v,
                                bs_h, beta_h, tc_h, z_h, z_h))

    v = _luma_pass(img, bs_v, beta_v, tc_v, z_v, z_v, bit_depth=8)
    single = np.asarray(_luma_pass(v.T, bs_h, beta_h, tc_h, z_h, z_h,
                                   bit_depth=8)).T

    assert np.array_equal(sharded, single)


def test_level_validation(native_build):
    """Annex-A wiring: auto level is conformant; a forced too-low level is
    flagged by the Python encoder (models.profiles) AND by the native
    decoder's SPS validation (DE265_WARNING_LEVEL_LIMITS_EXCEEDED)."""
    import warnings as pywarnings

    from libde265_tpu import Decoder
    from libde265_tpu.encoder import Encoder
    from libde265_tpu.models.profiles import min_level_for

    LEVEL_WARN = 1038  # DE265_WARNING_LEVEL_LIMITS_EXCEEDED
    W, H = 320, 256
    y = (np.arange(W * H, dtype=np.uint32).reshape(H, W) % 200).astype(
        np.uint8)

    enc = Encoder(qp=30)
    data = enc.encode(y) + enc.finish()
    dec = Decoder()
    list(dec.decode_all(data))
    assert LEVEL_WARN not in dec.get_warnings()

    assert min_level_for(W, H).idc > 30  # 81920 luma samples > level-1 cap
    with pywarnings.catch_warnings(record=True) as rec:
        pywarnings.simplefilter("always")
        enc2 = Encoder(qp=30, level_idc=30)
        data2 = enc2.encode(y) + enc2.finish()
    assert any("Annex-A" in str(r.message) for r in rec)
    dec2 = Decoder()
    list(dec2.decode_all(data2))
    assert LEVEL_WARN in dec2.get_warnings()


def test_profiles():
    from libde265_tpu.models import MAIN, MAIN10, level_limits, PROFILES
    from libde265_tpu.models.profiles import min_level_for

    assert MAIN.max_bit_depth == 8
    assert MAIN10.max_bit_depth == 10
    assert PROFILES[1].name == "Main"
    assert level_limits(120).max_luma_ps >= 1920 * 1080
    assert min_level_for(3840, 2160, 30).idc >= 150
