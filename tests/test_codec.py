"""Codec unit tests: varint + delta roundtrip, block metadata, block
slicing. Mirrors the reference's roundtrip property test
(index/core/indexer_test.go:24-44) on the upgraded delta+varint format.
No Spark needed."""

import numpy as np
import pytest

from search_engine_spark.functions import codec


def test_varint_roundtrip_edges():
    vals = np.array([0, 1, 127, 128, 129, 16383, 16384, 2**21 - 1, 2**35, 2**62], np.uint64)
    buf, nbytes = codec.varint_encode(vals)
    assert nbytes.tolist() == [1, 1, 1, 2, 2, 2, 3, 3, 6, 9]
    assert (codec.varint_decode(buf) == vals).all()


def test_reference_fixture_roundtrip():
    # indexer_test.go:24-44: postings docIds {5,6,7} positions
    # [1,2,3],[4,6,8],[6,7,8] — titleEnd 0.
    blob, last, maxtf, offs = codec.encode_term_postings(
        [5, 6, 7], [0, 0, 0], [[1, 2, 3], [4, 6, 8], [6, 7, 8]]
    )
    d, te, pc, pos = codec.decode_term_postings(blob)
    assert d.tolist() == [5, 6, 7]
    assert te.tolist() == [0, 0, 0]
    assert pc.tolist() == [3, 3, 3]
    assert pos.tolist() == [1, 2, 3, 4, 6, 8, 6, 7, 8]
    assert last.tolist() == [7] and maxtf.tolist() == [3]


def test_title_body_field_split():
    # title positions [0, 7] then body positions [0, 3] (not globally
    # sorted — sorted within each field, indexer.go:129-134)
    blob, *_ = codec.encode_term_postings([42], [2], [[0, 7, 0, 3]])
    d, te, pc, pos = codec.decode_term_postings(blob)
    assert d.tolist() == [42] and te.tolist() == [2]
    assert pos.tolist() == [0, 7, 0, 3]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_bucket_roundtrip_random(seed):
    rng = np.random.default_rng(seed)
    term_ids, doc_ids, tes, pcs, flat = [], [], [], [], []
    for t in range(int(rng.integers(1, 6))):
        docs = np.sort(rng.choice(10**7, int(rng.integers(1, 500)), replace=False))
        for dd in docs:
            n = int(rng.integers(1, 9))
            te = int(rng.integers(0, n + 1))
            tp = np.sort(rng.choice(300, te, replace=False))
            bp = np.sort(rng.choice(3000, n - te, replace=False))
            term_ids.append(t * 31 + 5)
            doc_ids.append(dd)
            tes.append(te)
            pcs.append(n)
            flat.extend(tp.tolist() + bp.tolist())
    eb = codec.encode_bucket(
        np.array(term_ids), np.array(doc_ids), np.array(tes),
        np.array(pcs), np.array(flat),
    )
    ti = np.array(term_ids)
    di = np.array(doc_ids)
    pcarr = np.array(pcs)
    ps = np.zeros(len(pcs), np.int64)
    np.cumsum(pcarr[:-1], out=ps[1:])
    flat = np.array(flat)
    for k, term in enumerate(eb.term_ids):
        m = ti == term
        d, te, pc, pos = codec.decode_term_postings(eb.blobs[k])
        assert (d == di[m]).all()
        assert (pc == pcarr[m]).all()
        exp_pos = np.concatenate(
            [flat[ps[i] : ps[i] + pcarr[i]] for i in np.flatnonzero(m)]
        )
        assert (pos == exp_pos).all()
        # block metadata + independent block decode
        nb = len(eb.block_offsets[k])
        assert nb == (m.sum() + codec.BLOCK_SIZE - 1) // codec.BLOCK_SIZE
        for b in range(nb):
            d2, _, pc2, _ = codec.slice_blocks(
                eb.blobs[k], eb.block_offsets[k], int(m.sum()), b, b + 1
            )
            lo, hi = b * codec.BLOCK_SIZE, (b + 1) * codec.BLOCK_SIZE
            assert (d2 == di[m][lo:hi]).all()
            assert eb.block_max_tf[k][b] == pcarr[m][lo:hi].max()
            assert eb.block_last[k][b] == di[m][lo:hi][-1]


def test_compression_beats_absolute():
    # dense doc ids -> gaps of 1 -> one byte each regardless of magnitude
    docs = np.arange(10**6, 10**6 + 1000)
    blob, *_ = codec.encode_term_postings(
        docs.tolist(), [0] * 1000, [[5]] * 1000
    )
    # absolute varint of 1e6-range ids needs 3 bytes; gaps need 1
    assert len(blob) < 1000 * (1 + 1 + 1 + 1) + 50
