"""mc_pallas segment kernel vs the XLA per-cell MC oracle (ops/mc.py math).

Random PU layouts + motion on random reference stacks; the Pallas kernel
runs in interpret mode (CPU backend) and must be bit-exact with the
reference formulation used by tpu_decode._mc_plane.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from libde265_tpu.decoder import PU_DTYPE
from libde265_tpu.ops import mc_pallas as mp
from libde265_tpu.tpu_decode import _mc_plane
from libde265_tpu.ops.mc import QPEL_FILTERS, EPEL_FILTERS


def _random_pus(rng, H, W, n, list_idx=0, max_mv=40):
    """Disjoint-ish PU rectangles on a 4-pel grid (overlap is fine for the
    kernel: later segments win, and we build cells the same way)."""
    recs = np.zeros(n, PU_DTYPE)
    for i in range(n):
        w = int(rng.choice([4, 8, 12, 16, 24, 32, 48, 64]))
        h = int(rng.choice([4, 8, 16, 32, 64]))
        x = int(rng.integers(0, max(W - w, 4) // 4)) * 4
        y = int(rng.integers(0, max(H - h, 4) // 4)) * 4
        recs[i]["x"], recs[i]["y"] = x, y
        recs[i]["w"], recs[i]["h"] = min(w, W - x), min(h, H - y)
        recs[i][f"mv{list_idx}x"] = int(rng.integers(-max_mv * 4, max_mv * 4))
        recs[i][f"mv{list_idx}y"] = int(rng.integers(-max_mv * 4, max_mv * 4))
        recs[i]["pred_flags"] = 1 << list_idx
        recs[i][f"ref_dpb{list_idx}"] = int(rng.integers(0, 3))
    return recs


def _cells_from_pus(pus, H, W, list_idx):
    """Rasterize PUs to the per-cell mv/slot grid (later PU wins)."""
    pb_h, pb_w = H // 4, W // 4
    mvx = np.zeros((pb_h, pb_w), np.int32)
    mvy = np.zeros((pb_h, pb_w), np.int32)
    slot = np.zeros((pb_h, pb_w), np.int32)
    covered = np.zeros((pb_h, pb_w), bool)
    for p in pus:
        ys, xs = p["y"] // 4, p["x"] // 4
        ye, xe = (p["y"] + p["h"]) // 4, (p["x"] + p["w"]) // 4
        mvx[ys:ye, xs:xe] = p[f"mv{list_idx}x"]
        mvy[ys:ye, xs:xe] = p[f"mv{list_idx}y"]
        slot[ys:ye, xs:xe] = p[f"ref_dpb{list_idx}"]
        covered[ys:ye, xs:xe] = True
    return mvx.ravel(), mvy.ravel(), slot.ravel(), covered


def _segments_overlap(pus):
    """True if any two PUs overlap (oracle then disagrees by construction:
    the cell grid resolves overlap per cell, segments per write order)."""
    boxes = [(p["x"], p["y"], p["x"] + p["w"], p["y"] + p["h"]) for p in pus]
    for i in range(len(boxes)):
        for j in range(i + 1, len(boxes)):
            a, b = boxes[i], boxes[j]
            if a[0] < b[2] and b[0] < a[2] and a[1] < b[3] and b[1] < a[3]:
                return True
    return False


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("chroma", [False, True])
def test_mc_pallas_matches_xla(seed, chroma):
    rng = np.random.default_rng(seed)
    H, W = 64, 96
    R = 3
    sub = 2
    bd = 8
    for _ in range(50):
        pus = _random_pus(rng, H, W, int(rng.integers(1, 6)))
        if not _segments_overlap(pus):
            break
    mvx, mvy, slot, covered = _cells_from_pus(pus, H, W, 0)

    if chroma:
        Hc, Wc = H // sub, W // sub
        ref = rng.integers(0, 255, (R, Hc, Wc), np.int32)
        T, OR = 4, 4 // sub
        fx_c = (mvx & 7)
        fy_c = (mvy & 7)
        N = (H // 4) * (W // 4)
        cy = (np.arange(N) // (W // 4)) * 4 // sub
        cx = (np.arange(N) % (W // 4)) * 4 // sub
        xint = cx + (mvx >> 3)
        yint = cy + (mvy >> 3)
        exp = np.asarray(_mc_plane(
            jnp.asarray(ref), jnp.asarray(slot), jnp.asarray(xint),
            jnp.asarray(yint), jnp.asarray(fx_c), jnp.asarray(fy_c),
            jnp.asarray(EPEL_FILTERS), 4, 4 // sub, bd))
        Hp, Wp = Hc, Wc
    else:
        ref = rng.integers(0, 255, (R, H, W), np.int32)
        T, OR = 8, 4
        N = (H // 4) * (W // 4)
        cy = (np.arange(N) // (W // 4)) * 4
        cx = (np.arange(N) % (W // 4)) * 4
        xint = cx + (mvx >> 2)
        yint = cy + (mvy >> 2)
        exp = np.asarray(_mc_plane(
            jnp.asarray(ref), jnp.asarray(slot), jnp.asarray(xint),
            jnp.asarray(yint), jnp.asarray(mvx & 3), jnp.asarray(mvy & 3),
            jnp.asarray(QPEL_FILTERS), 8, 4, bd))
        Hp, Wp = H, W

    # pallas path
    hp, wp = mp.pad_sizes(Hp, Wp)
    padded = np.stack([np.asarray(mp.pad_plane(jnp.asarray(r), hp, wp))
                       for r in ref])
    refs2d = jnp.asarray(padded.reshape(R * hp, wp))
    counts, sidx, K = mp.plan_segment_indices(pus, 0, H)
    puw = mp.pus_to_wire(pus)
    n_bands = H // 4
    Wout = max(256, (Wp + 127) & ~127)
    stripes = mp.mc_stripes(
        refs2d, jnp.asarray(counts), jnp.asarray(sidx),
        mp.pack_pu_mc(jnp.asarray(puw), 0),
        OR=OR, T=T, Hpad=hp, Wout=Wout, n_bands=n_bands, KMAX=K, bd=bd,
        chroma=chroma, Hdim=Hp, Wdim=Wp, sub_x=sub, sub_y=sub,
        interpret=True)
    got_plane = np.asarray(stripes).reshape(n_bands * OR, Wout)[:Hp, :Wp]

    # oracle blocks -> plane (covered cells only)
    exp_plane = np.zeros((Hp, Wp), np.int32)
    csv, cs = OR, 4 // sub if chroma else 4
    pb_w = W // 4
    for n in range(N):
        if not covered.ravel()[n]:
            continue
        r, c = n // pb_w, n % pb_w
        exp_plane[r * csv:(r + 1) * csv, c * cs:(c + 1) * cs] = \
            exp[n, :csv, :cs]
    mask = np.zeros((Hp, Wp), bool)
    for n in range(N):
        if covered.ravel()[n]:
            r, c = n // pb_w, n % pb_w
            mask[r * csv:(r + 1) * csv, c * cs:(c + 1) * cs] = True

    assert np.array_equal(got_plane[mask], exp_plane[mask]), (
        np.argwhere((got_plane != exp_plane) & mask)[:5])


@pytest.mark.parametrize("seed,use_l1", [(3, False), (4, True), (5, True)])
def test_paint_pu_idx_matches_raster(seed, use_l1):
    """Device-side pu_idx painting vs the host rasterization (disjoint
    PUs; the union of list-0/list-1 segments covers every inter PU)."""
    rng = np.random.default_rng(seed)
    H, W = 64, 96
    pb_h, pb_w = H // 4, W // 4
    # disjoint PU rectangles on an 8x8 grid
    pus = []
    for by in range(0, H, 16):
        for bx in range(0, W, 16):
            if rng.random() < 0.3:
                continue  # intra hole
            r = np.zeros(1, PU_DTYPE)[0]
            r["x"], r["y"] = bx, by
            r["w"], r["h"] = 16, 16
            pf = int(rng.integers(1, 4)) if use_l1 else 1
            r["pred_flags"] = pf
            pus.append(r)
    pus = np.array(pus, PU_DTYPE)

    exp = np.full((pb_h, pb_w), -1, np.int32)
    for i, p in enumerate(pus):
        exp[p["y"] // 4:(p["y"] + p["h"]) // 4,
            p["x"] // 4:(p["x"] + p["w"]) // 4] = i

    L = 2 if use_l1 else 1
    counts, sidxs = [], []
    kp = 1
    for l in range(L):
        c, s, K = mp.plan_segment_indices(pus, l, H)
        counts.append(c)
        sidxs.append(s)
        kp = max(kp, s.shape[1])
    sidx2 = np.zeros((pb_h, L, kp), np.int32)
    for l in range(L):
        sidx2[:, l, :sidxs[l].shape[1]] = sidxs[l]
    got = np.asarray(mp.paint_pu_idx(
        jnp.asarray(np.stack(counts)), jnp.asarray(sidx2),
        mp.pack_pu_geo(jnp.asarray(mp.pus_to_wire(pus))),
        n_bands=pb_h, W4=pb_w, L=L,
        interpret=True))
    assert np.array_equal(got, exp), np.argwhere(got != exp)[:5]


@pytest.mark.parametrize("lg,OR", [(2, 4), (3, 4), (4, 4), (5, 4),
                                   (2, 2), (3, 2), (5, 2)])
def test_residual_stripes_matches_scatter(lg, OR):
    rng = np.random.default_rng(lg * 10 + OR)
    s = 1 << lg
    H, W = 64, 96 if OR == 4 else 48
    n_bands = H // OR
    N = 9
    bin_res = rng.integers(-500, 500, (N, s, s)).astype(np.int32)
    # disjoint TU placements on the s-grid
    cells = [(x, y) for y in range(0, H - s + 1, s)
             for x in range(0, W - s + 1, s)]
    cells = [cells[i] for i in rng.permutation(len(cells))]
    N = min(N, len(cells))
    bin_res = bin_res[:N]
    sc = np.array([[i, cells[i][0], cells[i][1]] for i in range(N)],
                  np.int32)

    exp = np.zeros((H, W), np.int64)
    for i, x, y in sc:
        exp[y:y + s, x:x + s] += bin_res[i]

    band, srow, x0 = mp.plan_residual_segments(sc, s, OR)
    cnt, sw, K = mp.pack_band_segments(band, srow, x0, n_bands)
    Wout = max(256, (W + 127) & ~127)
    stripes = mp.residual_stripes(
        jnp.asarray(bin_res), jnp.asarray(cnt), jnp.asarray(sw),
        OR=OR, S=s, Wout=Wout, n_bands=n_bands,
        interpret=True)
    got = np.asarray(stripes).reshape(n_bands * OR, Wout)[:H, :W]
    assert np.array_equal(got, exp), np.argwhere(got != exp)[:5]
