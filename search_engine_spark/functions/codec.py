"""Delta + varint postings codec, fully vectorized (numpy — no per-value
or per-doc Python loops; the only Python iteration is per 128-doc block
and per term blob slice).

The reference encodes postings as *absolute* signed varints
(index/core/indexer.go:176-222). The north rule upgrades this to
delta+varint (doc-id gaps, per-field position gaps) with a block-max
sidecar for WAND pruning — a deliberate, documented divergence
(SURVEY §2.5 E1).

Blob layout for one term (all unsigned LEB128 varints), blocked
struct-of-arrays so any block decodes independently and vectorized:

    header: n_docs
    per block of BLOCK_SIZE docs (nb = docs in this block):
        gaps[nb]        doc_id deltas; the block's FIRST gap is the
                        absolute doc_id (blocks are self-contained)
        npos[nb]        positions per doc (= tf, title+body combined)
        te[nb]          title_end per doc (indexer.go:132-134)
        pdeltas[sum(npos)]  position gaps; per doc: title-field gaps
                        then body-field gaps, first of each field
                        absolute (per-field 0-based rune offsets)

Sidecar (parquet array columns, NOT in the blob — WAND prunes blocks
without touching blob bytes):

    block_last_doc: long[]  last doc_id per block
    block_max_tf:   int[]   max tf per block
    block_offsets:  long[]  byte offset of each block within the blob
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128

_U64 = np.uint64
_MASK7 = _U64(0x7F)
_CONT = np.uint8(0x80)


def varint_encode(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """LEB128-encode a non-negative int array.

    Returns (bytes uint8 array, per-value byte length int64 array).
    """
    v = values.astype(np.uint64, copy=False)
    if v.size == 0:
        return np.empty(0, np.uint8), np.empty(0, np.int64)
    nbytes = np.ones(v.size, np.int64)
    for k in range(1, 10):
        more = v >= (_U64(1) << _U64(7 * k))
        if not more.any():
            break
        nbytes += more.astype(np.int64)
    ends = np.cumsum(nbytes)
    out = np.zeros(int(ends[-1]), np.uint8)
    starts = ends - nbytes
    for k in range(10):
        sel = nbytes > k
        if not sel.any():
            break
        idx = starts[sel] + k
        chunk = ((v[sel] >> _U64(7 * k)) & _MASK7).astype(np.uint8)
        cont = (nbytes[sel] > k + 1).astype(np.uint8) * _CONT
        out[idx] = chunk | cont
    return out, nbytes


def varint_decode(data: np.ndarray) -> np.ndarray:
    """Decode LEB128 bytes (uint8 array) back to uint64 values."""
    b = np.asarray(data, np.uint8)
    if b.size == 0:
        return np.empty(0, np.uint64)
    is_end = (b & _CONT) == 0
    n_out = int(is_end.sum())
    val_idx = np.zeros(b.size, np.int64)
    np.cumsum(is_end[:-1], out=val_idx[1:])
    start_of_val = np.zeros(n_out, np.int64)
    ends_at = np.flatnonzero(is_end)
    start_of_val[1:] = ends_at[:-1] + 1
    pos_in_val = np.arange(b.size, dtype=np.int64) - start_of_val[val_idx]
    out = np.zeros(n_out, np.uint64)
    np.add.at(
        out,
        val_idx,
        (b & np.uint8(0x7F)).astype(np.uint64) << (pos_in_val.astype(np.uint64) * _U64(7)),
    )
    return out


def _segmented_cumsum(deltas: np.ndarray, reset_starts: np.ndarray) -> np.ndarray:
    """Invert delta encoding where ``deltas[reset_starts]`` are absolute:
    cumulative sum that restarts at each reset index. Vectorized."""
    if deltas.size == 0:
        return deltas.astype(np.int64)
    cs = np.cumsum(deltas, dtype=np.int64)
    seg_of = np.searchsorted(reset_starts, np.arange(deltas.size), side="right") - 1
    offsets = cs[reset_starts] - deltas[reset_starts]
    return cs - offsets[seg_of]


def _position_deltas(pos: np.ndarray, pos_starts: np.ndarray, title_ends: np.ndarray, npos: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Delta-encode flat positions (per-doc, per-field runs).

    Returns (deltas, reset_starts) where reset indices hold absolutes.
    """
    out = pos.astype(np.int64, copy=True)
    if pos.size > 1:
        out[1:] = pos[1:] - pos[:-1]
    body_starts = pos_starts + title_ends
    valid = body_starts < pos_starts + npos
    resets = np.unique(np.concatenate([pos_starts, body_starts[valid]]))
    # a TRAILING zero-position doc has pos_starts == pos.size (out of
    # bounds); mid-array empties point at the next doc's start, which is
    # already an absolute-reset index, so dropping OOB entries is exact
    resets = resets[resets < pos.size]
    out[resets] = pos[resets]
    return out, resets


class EncodedBucket:
    """Per-term encoded postings for one bucket of terms."""

    __slots__ = ("term_ids", "dfs", "ctfs", "blobs", "block_last", "block_max_tf", "block_offsets")

    def __init__(self, term_ids, dfs, ctfs, blobs, block_last, block_max_tf, block_offsets):
        self.term_ids = term_ids
        self.dfs = dfs
        self.ctfs = ctfs
        self.blobs = blobs
        self.block_last = block_last
        self.block_max_tf = block_max_tf
        self.block_offsets = block_offsets


def encode_bucket(
    term_ids: np.ndarray,
    doc_ids: np.ndarray,
    title_ends: np.ndarray,
    pos_counts: np.ndarray,
    positions_flat: np.ndarray,
) -> EncodedBucket:
    """Encode ALL terms of a bucket in one vectorized pass.

    Inputs are doc-level arrays sorted by (term_id, doc_id);
    ``positions_flat`` is the concatenation of each doc's positions.
    One varint_encode call covers every term; per-term blobs are byte
    slices of the shared buffer.
    """
    N = doc_ids.size
    if N == 0:
        e = np.empty(0, np.int64)
        return EncodedBucket(e, e, e, [], [], [], [])
    term_ids = term_ids.astype(np.int64, copy=False)
    doc_ids = doc_ids.astype(np.int64, copy=False)
    title_ends = title_ends.astype(np.int64, copy=False)
    pos_counts = pos_counts.astype(np.int64, copy=False)

    # --- term boundaries ---------------------------------------------------
    is_term_start = np.ones(N, bool)
    is_term_start[1:] = term_ids[1:] != term_ids[:-1]
    term_starts = np.flatnonzero(is_term_start)
    uniq_terms = term_ids[term_starts]
    T = term_starts.size
    term_doc_counts = np.diff(np.append(term_starts, N))
    term_of_doc = np.cumsum(is_term_start) - 1

    pos_starts = np.zeros(N, np.int64)
    np.cumsum(pos_counts[:-1], out=pos_starts[1:])

    # --- block boundaries (per term, every BLOCK_SIZE docs) ----------------
    rank_in_term = np.arange(N) - term_starts[term_of_doc]
    is_block_start = (rank_in_term % BLOCK_SIZE) == 0
    block_start_docs = np.flatnonzero(is_block_start)
    B = block_start_docs.size
    block_of_doc = np.cumsum(is_block_start) - 1
    nb = np.diff(np.append(block_start_docs, N))
    term_of_block = term_of_doc[block_start_docs]
    sum_pos_b = np.add.reduceat(pos_counts, block_start_docs)

    # --- value stream layout ------------------------------------------------
    block_vlen = 3 * nb + sum_pos_b
    block_vends = np.cumsum(block_vlen)
    block_vrel = block_vends - block_vlen  # start rel. to first block, no headers
    first_block_of_term = block_of_doc[term_starts]
    # headers: one per term, sitting before that term's first block
    hdr_before = term_of_block + 1  # headers preceding-or-at this block's term
    block_vstarts = block_vrel + hdr_before
    term_vstarts = block_vrel[first_block_of_term] + term_of_block[first_block_of_term]
    total_values = int(block_vends[-1]) + T
    stream = np.empty(total_values, np.int64)
    stream[term_vstarts] = term_doc_counts

    # --- gaps (absolute at block starts) ------------------------------------
    gaps = doc_ids.copy()
    gaps[1:] = doc_ids[1:] - doc_ids[:-1]
    gaps[block_start_docs] = doc_ids[block_start_docs]
    rank_in_block = np.arange(N) - block_start_docs[block_of_doc]
    base = block_vstarts[block_of_doc]
    stream[base + rank_in_block] = gaps
    stream[base + nb[block_of_doc] + rank_in_block] = pos_counts
    stream[base + 2 * nb[block_of_doc] + rank_in_block] = title_ends

    # --- position deltas ----------------------------------------------------
    P = positions_flat.size
    if P:
        pdeltas, _ = _position_deltas(positions_flat, pos_starts, title_ends, pos_counts)
        doc_of_pos = np.repeat(np.arange(N), pos_counts)
        k_in_doc = np.arange(P) - pos_starts[doc_of_pos]
        blk = block_of_doc[doc_of_pos]
        # offset of this doc's deltas inside its block's delta section
        pos_before_doc_in_block = pos_starts[doc_of_pos] - pos_starts[block_start_docs[blk]]
        didx = block_vstarts[blk] + 3 * nb[blk] + pos_before_doc_in_block + k_in_doc
        stream[didx] = pdeltas

    # --- one varint pass ------------------------------------------------------
    buf, nbytes = varint_encode(stream)
    byte_ends = np.cumsum(nbytes)
    vstart_to_byte = np.zeros(total_values + 1, np.int64)
    vstart_to_byte[1:] = byte_ends
    term_byte_starts = vstart_to_byte[term_vstarts]
    term_byte_ends = np.append(term_byte_starts[1:], int(byte_ends[-1]))
    block_byte_starts = vstart_to_byte[block_vstarts]

    # --- per-block metadata -----------------------------------------------
    block_last = doc_ids[np.append(block_start_docs[1:] - 1, N - 1)]
    block_max = np.maximum.reduceat(pos_counts, block_start_docs)

    # --- slice per term -------------------------------------------------------
    raw = buf.tobytes()
    blobs: list[bytes] = []
    bl_last: list[np.ndarray] = []
    bl_max: list[np.ndarray] = []
    bl_off: list[np.ndarray] = []
    term_block_bounds = np.append(first_block_of_term, B)
    for t in range(T):
        b0, b1 = term_block_bounds[t], term_block_bounds[t + 1]
        s, e = int(term_byte_starts[t]), int(term_byte_ends[t])
        blobs.append(raw[s:e])
        bl_last.append(block_last[b0:b1])
        bl_max.append(block_max[b0:b1].astype(np.int32))
        bl_off.append(block_byte_starts[b0:b1] - s)
    ctfs = np.add.reduceat(pos_counts, term_starts)
    return EncodedBucket(uniq_terms, term_doc_counts, ctfs, blobs, bl_last, bl_max, bl_off)


def encode_term_postings(doc_ids, title_ends, positions_list):
    """Convenience single-term encode (tests): positions_list is a list of
    per-doc position arrays."""
    pos_counts = np.array([len(p) for p in positions_list], np.int64)
    flat = (
        np.concatenate([np.asarray(p, np.int64) for p in positions_list])
        if positions_list
        else np.empty(0, np.int64)
    )
    term = np.zeros(len(doc_ids), np.int64)
    eb = encode_bucket(term, np.asarray(doc_ids, np.int64), np.asarray(title_ends, np.int64), pos_counts, flat)
    return eb.blobs[0], eb.block_last[0], eb.block_max_tf[0], eb.block_offsets[0]


def _decode_values(body: np.ndarray, n_docs: int, first_block_absolute_doc: bool = True):
    """Decode the value stream of >=1 consecutive blocks (no term header).

    Returns (doc_ids, title_ends, npos, positions_flat).
    Loops only over blocks; all inner work is vectorized.
    """
    g_parts, np_parts, te_parts, pd_parts = [], [], [], []
    s = 0
    remaining = n_docs
    while remaining > 0:
        nb_ = min(BLOCK_SIZE, remaining)
        gaps = body[s : s + nb_]
        npos = body[s + nb_ : s + 2 * nb_]
        te = body[s + 2 * nb_ : s + 3 * nb_]
        sp = int(npos.sum())
        pd = body[s + 3 * nb_ : s + 3 * nb_ + sp]
        g_parts.append(np.cumsum(gaps))  # block-local: first gap absolute
        np_parts.append(npos)
        te_parts.append(te)
        pd_parts.append(pd)
        s += 3 * nb_ + sp
        remaining -= nb_
    doc_ids = np.concatenate(g_parts) if g_parts else np.empty(0, np.int64)
    npos = np.concatenate(np_parts) if np_parts else np.empty(0, np.int64)
    te = np.concatenate(te_parts) if te_parts else np.empty(0, np.int64)
    pdeltas = np.concatenate(pd_parts) if pd_parts else np.empty(0, np.int64)
    if pdeltas.size:
        pos_starts = np.zeros(npos.size, np.int64)
        np.cumsum(npos[:-1], out=pos_starts[1:])
        body_starts = pos_starts + te
        valid = body_starts < pos_starts + npos
        resets = np.unique(np.concatenate([pos_starts, body_starts[valid]]))
        positions = _segmented_cumsum(pdeltas, resets)
    else:
        positions = np.empty(0, np.int64)
    return doc_ids, te, npos, positions


def decode_term_postings(blob: bytes):
    """Full decode -> (doc_ids, title_ends, pos_counts, positions_flat)."""
    vals = varint_decode(np.frombuffer(blob, np.uint8)).astype(np.int64)
    if vals.size == 0:
        z = np.empty(0, np.int64)
        return z, z, z, z
    n = int(vals[0])
    return _decode_values(vals[1:], n)


def slice_blocks(blob: bytes, block_offsets: np.ndarray, n_docs: int, lo_block: int, hi_block: int):
    """Decode only blocks [lo_block, hi_block) — for WAND block skipping.

    Block b spans bytes [block_offsets[b], block_offsets[b+1]) (last block
    to end of blob). Each block's first gap is absolute, so any slice
    decodes standalone.
    """
    n_blocks = len(block_offsets)
    lo_block = max(0, lo_block)
    hi_block = min(n_blocks, hi_block)
    if lo_block >= hi_block:
        z = np.empty(0, np.int64)
        return z, z, z, z
    start = int(block_offsets[lo_block])
    end = int(block_offsets[hi_block]) if hi_block < n_blocks else len(blob)
    body = varint_decode(np.frombuffer(blob[start:end], np.uint8)).astype(np.int64)
    n_in_slice = min(n_docs - lo_block * BLOCK_SIZE, (hi_block - lo_block) * BLOCK_SIZE)
    return _decode_values(body, n_in_slice)


def pack_position_deltas(
    pos: np.ndarray, starts: np.ndarray, title_ends: np.ndarray, npos: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Map-side packing: per-doc position-delta varint byte strings.

    ``pos`` is the flat concatenation of per-(doc,term) position lists
    (title field first, each field ascending); ``starts`` the per-doc
    start offsets. Returns (bytes uint8, per-doc byte lengths) where each
    doc's slice is EXACTLY the pdelta section the block layout expects —
    so the reduce side assembles blobs by byte concatenation and the
    shuffle moves ~1-2 bytes per position instead of an int32.
    """
    if pos.size == 0:
        return np.empty(0, np.uint8), np.zeros(starts.size, np.int64)
    deltas, _ = _position_deltas(
        pos.astype(np.int64, copy=False),
        starts.astype(np.int64, copy=False),
        title_ends.astype(np.int64, copy=False),
        npos.astype(np.int64, copy=False),
    )
    buf, nbytes = varint_encode(deltas)
    # reduceat only over docs that HAVE positions: their starts are
    # strictly increasing and in-bounds (a trailing empty doc's start ==
    # pos.size, which reduceat rejects); empty docs keep length 0, and a
    # non-empty doc's group extends over any empty docs that follow it —
    # they contribute no positions, so the sum is exact.
    doc_blen = np.zeros(starts.size, np.int64)
    nz = npos > 0
    if nz.any():
        doc_blen[nz] = np.add.reduceat(nbytes, starts[nz])
    return buf, doc_blen


def encode_bucket_packed(
    term_ids: np.ndarray,
    doc_ids: np.ndarray,
    title_ends: np.ndarray,
    pos_counts: np.ndarray,
    pd_offsets: np.ndarray,
    pd_bytes: np.ndarray,
) -> EncodedBucket:
    """encode_bucket twin for PRE-PACKED per-doc position-delta bytes.

    Inputs are sorted by (term_id, doc_id); ``pd_bytes[pd_offsets[i]:
    pd_offsets[i+1]]`` is doc i's packed pdelta section (output of
    ``pack_position_deltas``). Produces byte-identical blobs to
    ``encode_bucket`` — only the integer streams (header, gaps, npos,
    title_end) are varint-encoded here; the position bytes are spliced
    in untouched.
    """
    N = doc_ids.size
    if N == 0:
        e = np.empty(0, np.int64)
        return EncodedBucket(e, e, e, [], [], [], [])
    term_ids = term_ids.astype(np.int64, copy=False)
    doc_ids = doc_ids.astype(np.int64, copy=False)
    title_ends = title_ends.astype(np.int64, copy=False)
    pos_counts = pos_counts.astype(np.int64, copy=False)

    is_term_start = np.ones(N, bool)
    is_term_start[1:] = term_ids[1:] != term_ids[:-1]
    term_starts = np.flatnonzero(is_term_start)
    uniq_terms = term_ids[term_starts]
    T = term_starts.size
    term_doc_counts = np.diff(np.append(term_starts, N))
    term_of_doc = np.cumsum(is_term_start) - 1

    rank_in_term = np.arange(N) - term_starts[term_of_doc]
    is_block_start = (rank_in_term % BLOCK_SIZE) == 0
    block_start_docs = np.flatnonzero(is_block_start)
    B = block_start_docs.size
    block_of_doc = np.cumsum(is_block_start) - 1
    nb = np.diff(np.append(block_start_docs, N))
    term_of_block = term_of_doc[block_start_docs]
    first_block_of_term = block_of_doc[term_starts]

    # --- integer stream: headers + per-block gaps/npos/te (NO pdeltas) ----
    block_vlen = 3 * nb
    block_vends = np.cumsum(block_vlen)
    block_vrel = block_vends - block_vlen
    block_vstarts = block_vrel + term_of_block + 1  # + headers before
    term_vstarts = block_vrel[first_block_of_term] + term_of_block[first_block_of_term]
    total_values = int(block_vends[-1]) + T
    stream = np.empty(total_values, np.int64)
    stream[term_vstarts] = term_doc_counts
    gaps = doc_ids.copy()
    gaps[1:] = doc_ids[1:] - doc_ids[:-1]
    gaps[block_start_docs] = doc_ids[block_start_docs]
    rank_in_block = np.arange(N) - block_start_docs[block_of_doc]
    base = block_vstarts[block_of_doc]
    stream[base + rank_in_block] = gaps
    stream[base + nb[block_of_doc] + rank_in_block] = pos_counts
    stream[base + 2 * nb[block_of_doc] + rank_in_block] = title_ends

    buf_i, nbytes_i = varint_encode(stream)
    vstart_to_byte = np.zeros(total_values + 1, np.int64)
    np.cumsum(nbytes_i, out=vstart_to_byte[1:])
    hdr_b0 = vstart_to_byte[term_vstarts]
    hdr_b1 = vstart_to_byte[term_vstarts + 1]
    ints_b0 = vstart_to_byte[block_vstarts]
    ints_b1 = vstart_to_byte[block_vstarts + block_vlen]

    # --- per-block pdelta byte spans (docs contiguous in sorted order) ----
    doc_blen = np.diff(pd_offsets)
    pd_block_start = pd_offsets[:-1][block_start_docs]
    pd_block_len = np.add.reduceat(doc_blen, block_start_docs) if N else np.empty(0, np.int64)

    # --- assemble: [hdr_t][ints_b0][pd_b0][ints_b1][pd_b1]... ------------
    ints_len = ints_b1 - ints_b0
    hdr_len = hdr_b1 - hdr_b0
    n_sec = T + 2 * B
    sec_len = np.empty(n_sec, np.int64)
    hdr_idx = np.arange(T) + 2 * first_block_of_term
    ints_idx = term_of_block + 1 + 2 * np.arange(B)
    pd_idx = ints_idx + 1
    sec_len[hdr_idx] = hdr_len
    sec_len[ints_idx] = ints_len
    sec_len[pd_idx] = pd_block_len
    sec_off = np.zeros(n_sec + 1, np.int64)
    np.cumsum(sec_len, out=sec_off[1:])

    out = np.empty(int(sec_off[-1]), np.uint8)
    # contiguous span copies (vectorized per section via ragged scatter)
    _scatter_spans(out, sec_off[hdr_idx], buf_i, hdr_b0, hdr_len)
    _scatter_spans(out, sec_off[ints_idx], buf_i, ints_b0, ints_len)
    _scatter_spans(out, sec_off[pd_idx], pd_bytes, pd_block_start, pd_block_len)

    term_b0 = sec_off[hdr_idx]
    term_b1 = np.append(term_b0[1:], sec_off[-1])
    block_out_off = sec_off[ints_idx] - term_b0[term_of_block]

    block_last = doc_ids[np.append(block_start_docs[1:] - 1, N - 1)]
    block_max = np.maximum.reduceat(pos_counts, block_start_docs)

    raw = out.tobytes()
    blobs, bl_last, bl_max, bl_off = [], [], [], []
    term_block_bounds = np.append(first_block_of_term, B)
    for t in range(T):
        b0, b1 = term_block_bounds[t], term_block_bounds[t + 1]
        blobs.append(raw[int(term_b0[t]) : int(term_b1[t])])
        bl_last.append(block_last[b0:b1])
        bl_max.append(block_max[b0:b1].astype(np.int32))
        bl_off.append(block_out_off[b0:b1])
    ctfs = np.add.reduceat(pos_counts, term_starts)
    return EncodedBucket(uniq_terms, term_doc_counts, ctfs, blobs, bl_last, bl_max, bl_off)


def _scatter_spans(
    out: np.ndarray,
    out_starts: np.ndarray,
    src: np.ndarray,
    src_starts: np.ndarray,
    lens: np.ndarray,
) -> None:
    """out[out_starts[i] : +lens[i]] = src[src_starts[i] : +lens[i]] for
    all i, fully vectorized (repeat/arange ragged index trick)."""
    total = int(lens.sum())
    if total == 0:
        return
    nz = lens > 0
    os_, ss_, ln_ = out_starts[nz], src_starts[nz], lens[nz]
    excl = np.zeros(ln_.size, np.int64)
    np.cumsum(ln_[:-1], out=excl[1:])
    ar = np.arange(total, dtype=np.int64)
    within = ar - np.repeat(excl, ln_)
    out[np.repeat(os_, ln_) + within] = src[np.repeat(ss_, ln_) + within]
