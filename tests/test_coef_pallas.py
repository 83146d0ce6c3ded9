"""CSR coefficient densification kernel vs the scatter oracle.

ops/coef_pallas.densify_bin replaces the XLA generic scatter that
densifies each size-bin's coefficient CSR feed ([N, S, S] levels from the
delta-byte cv stream + coff) in the fused device program.  Bit-equality
in interpret mode on randomized CSR layouts, including misaligned group
starts, empty TUs, full TUs, negative values, zero advance/pad bytes,
long gaps (multi-advance chains), and watermark row padding.
"""
import numpy as np
import pytest

from libde265_tpu.ops import coef_pallas as cp


def _encode_run(pos, val):
    """Byte entries for one TU: sorted positions, vals in [-7..7]\\{0}."""
    order = np.argsort(pos)
    pos, val = np.asarray(pos)[order], np.asarray(val)[order]
    out = []
    p = -1
    for q, v in zip(pos, val):
        g = int(q) - p - 1
        out.extend([0] * (g // 15))
        out.append(((g % 15) & 0xF) | ((int(v) & 0xF) << 4))
        p = int(q)
    while len(out) % 4:
        out.append(0)
    return out


def _bytes_to_words(bs):
    b = np.asarray(bs, np.int64)
    if len(b) % 4:
        b = np.concatenate([b, np.zeros(4 - len(b) % 4, np.int64)])
    return (b[0::4] | (b[1::4] << 8) | (b[2::4] << 16) |
            (b[3::4] << 24)).astype(np.int32)


def _mk_csr(rng, N, S, max_nnz, dense_frac=0.1):
    """Random CSR bin: per-TU unique positions, 4-bit signed values,
    runs padded to 4-entry multiples with zero bytes."""
    bs, offs = [], [0]
    for t in range(N):
        if rng.random() < 0.25:
            n = 0
        elif rng.random() < dense_frac:
            n = min(S * S, max_nnz)
        else:
            n = int(rng.integers(1, min(S * S, max_nnz) + 1))
        pos = rng.permutation(S * S)[:n]
        val = rng.integers(-7, 8, n)
        val[val == 0] = 1
        e = _encode_run(pos, val) if n else []
        bs.extend(e)
        offs.append(offs[-1] + len(e))
    return _bytes_to_words(bs), np.array(offs, np.int32)


@pytest.mark.parametrize("S", [4, 8, 16, 32])
def test_densify_matches_oracle(S):
    rng = np.random.default_rng(3 + S)
    N = {4: 77, 8: 41, 16: 13, 32: 9}[S]
    cv, coff = _mk_csr(rng, N, S, max_nnz=S * S)
    cap = int(max((coff[1:] - coff[:-1]).max(initial=4), 4))
    cap = 1 << (cap - 1).bit_length()
    got = np.asarray(cp.densify_bin(cv, coff, N=N, S=S, CAP=cap,
                                    interpret=True))
    want = cp.densify_ref(cv, coff, N=N, S=S)
    np.testing.assert_array_equal(got, want)


def test_densify_long_gaps():
    # single far coefficients force multi-advance (zero byte) chains
    S, N = 32, 8
    bs, offs = [], [0]
    want = np.zeros((N, S, S), np.int32)
    rng = np.random.default_rng(5)
    for t in range(N):
        pos = [int(rng.integers(S * S - 64, S * S))]
        val = [int(rng.integers(1, 8))]
        want[t, pos[0] // S, pos[0] % S] = val[0]
        e = _encode_run(pos, val)
        bs.extend(e)
        offs.append(offs[-1] + len(e))
    cv, coff = _bytes_to_words(bs), np.array(offs, np.int32)
    cap = int((coff[1:] - coff[:-1]).max())
    got = np.asarray(cp.densify_bin(cv, coff, N=N, S=S, CAP=cap,
                                    interpret=True))
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(want, cp.densify_ref(cv, coff, N=N, S=S))


def test_densify_padded_rows_and_small_cap():
    # watermark padding: coff rows past the real TUs repeat the total
    rng = np.random.default_rng(9)
    S, N = 8, 10
    cv, coff = _mk_csr(rng, N, S, max_nnz=12)
    Npad = 32
    coff_p = np.concatenate(
        [coff, np.full(Npad + 1 - len(coff), coff[-1], np.int32)])
    cap = 1 << (int((coff[1:] - coff[:-1]).max(initial=4)) - 1).bit_length()
    got = np.asarray(cp.densify_bin(cv, coff_p, N=Npad, S=S, CAP=cap,
                                    interpret=True))
    want = cp.densify_ref(cv, coff_p, N=Npad, S=S)
    np.testing.assert_array_equal(got, want)
    assert not got[N:].any()


@pytest.mark.parametrize("S", [4, 8])
def test_densify_all_full_misaligned(S):
    # worst case for the chunk DMA window: every TU carries S*S
    # coefficients AND the group start is word-misaligned (regression
    # test for the dynamic_slice clamp at the group's last TU)
    rng = np.random.default_rng(1)
    G = cp._GROUP[S]
    N = 2 * G  # two groups; the second starts lane-misaligned
    nfull = S * S
    bs, offs = [], [0]
    for t in range(N):
        n = 4 if t == 0 else nfull  # small first run misaligns the rest
        pos = rng.permutation(nfull)[:n]
        val = rng.integers(1, 8, n)
        e = _encode_run(pos, val)
        bs.extend(e)
        offs.append(offs[-1] + len(e))
    cv, coff = _bytes_to_words(bs), np.array(offs, np.int32)
    cap = int((coff[1:] - coff[:-1]).max())
    got = np.asarray(cp.densify_bin(cv, coff, N=N, S=S, CAP=cap,
                                    interpret=True))
    want = cp.densify_ref(cv, coff, N=N, S=S)
    np.testing.assert_array_equal(got, want)


def test_densify_empty_bin():
    got = np.asarray(cp.densify_bin(
        np.zeros(0, np.int32), np.zeros(1, np.int32), N=0, S=4, CAP=8,
        interpret=True))
    assert got.shape == (0, 4, 4)
