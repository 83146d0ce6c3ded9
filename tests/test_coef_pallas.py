"""CSR coefficient densification kernel vs the scatter oracle.

ops/coef_pallas.densify_bin replaces the XLA generic scatter that
densifies each size-bin's coefficient CSR feed ([N, S, S] levels from
the 16-bit-entry cv stream + coff) in the fused device program.
Bit-equality in interpret mode on randomized CSR layouts, including
misaligned group starts, empty TUs, full TUs, negative values, val=0
run pads, and watermark row padding.
"""
import numpy as np
import pytest

from libde265_tpu.ops import coef_pallas as cp


def _entries_to_words(ent):
    if len(ent) % 2:
        ent = np.concatenate([ent, [0]])
    ent = ent.astype(np.int64)
    return ((ent[0::2] & 0xFFFF) | (ent[1::2] << 16)).astype(np.int32)


def _mk_csr(rng, N, S, max_nnz, dense_frac=0.1):
    """Random CSR bin: per-TU unique positions, 6-bit signed values,
    runs padded to even entry counts with val=0 entries."""
    ents, offs = [], [0]
    for t in range(N):
        if rng.random() < 0.25:
            n = 0
        elif rng.random() < dense_frac:
            n = min(S * S, max_nnz)
        else:
            n = int(rng.integers(1, min(S * S, max_nnz) + 1))
        pos = rng.permutation(S * S)[:n]
        val = rng.integers(-31, 32, n)
        val[val == 0] = 1
        e = ((val & 63) << 10) | pos
        if n % 2:
            e = np.concatenate([e, [0]])  # val=0 pad entry
        ents.append(e)
        offs.append(offs[-1] + len(e))
    ent = np.concatenate(ents).astype(np.int64) if offs[-1] else \
        np.zeros(0, np.int64)
    return _entries_to_words(ent), np.array(offs, np.int32)


@pytest.mark.parametrize("S", [4, 8, 16, 32])
def test_densify_matches_oracle(S):
    rng = np.random.default_rng(3 + S)
    N = {4: 77, 8: 41, 16: 13, 32: 9}[S]
    cv, coff = _mk_csr(rng, N, S, max_nnz=S * S)
    cap = int(max((coff[1:] - coff[:-1]).max(initial=2), 2))
    cap = 1 << (cap - 1).bit_length()
    got = np.asarray(cp.densify_bin(cv, coff, N=N, S=S, CAP=cap,
                                    interpret=True))
    want = cp.densify_ref(cv, coff, N=N, S=S)
    np.testing.assert_array_equal(got, want)


def test_densify_padded_rows_and_small_cap():
    # watermark padding: coff rows past the real TUs repeat the total
    rng = np.random.default_rng(9)
    S, N = 8, 10
    cv, coff = _mk_csr(rng, N, S, max_nnz=16)
    Npad = 32
    coff_p = np.concatenate(
        [coff, np.full(Npad + 1 - len(coff), coff[-1], np.int32)])
    got = np.asarray(cp.densify_bin(cv, coff_p, N=Npad, S=S, CAP=16,
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
    ents, offs = [], [0]
    for t in range(N):
        n = 4 if t == 0 else nfull  # small first run misaligns the rest
        pos = rng.permutation(nfull)[:n]
        val = rng.integers(1, 32, n)
        ents.append(((val & 63) << 10) | pos)
        offs.append(offs[-1] + n)
    ent = np.concatenate(ents).astype(np.int64)
    cv = _entries_to_words(ent)
    coff = np.array(offs, np.int32)
    got = np.asarray(cp.densify_bin(cv, coff, N=N, S=S, CAP=nfull,
                                    interpret=True))
    want = cp.densify_ref(cv, coff, N=N, S=S)
    np.testing.assert_array_equal(got, want)


def test_densify_empty_bin():
    got = np.asarray(cp.densify_bin(
        np.zeros(0, np.int32), np.zeros(1, np.int32), N=0, S=4, CAP=8,
        interpret=True))
    assert got.shape == (0, 4, 4)
