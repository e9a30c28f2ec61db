"""Posting-list codec: delta + varint, blocked for block-max WAND.

The reference delegates posting storage to Lucene (via ES); this module is
the engine-native equivalent (SURVEY §2 B2/B7).  Everything is vectorized
NumPy — no per-value Python in encode or decode.

Blob layout (one posting list = one ``EncodedPostings``):

* postings are (doc_id, tf, dl) triples in strictly ascending doc_id order,
  chunked into blocks of ≤ ``block_size`` postings;
* ``doc_blob``  — varint stream; within each block the FIRST value is the
  absolute doc_id, the rest are gaps ``doc_id[i] - doc_id[i-1]``;
* ``tf_blob``   — varint stream of term frequencies, same block boundaries;
* ``dl_blob``   — varint stream of document lengths (the BM25 length norm,
  stored inline like Lucene's norms file so query-time scoring needs NO join
  against a doc-length table);
* per-block sidecar arrays (kept as Spark array columns, not packed):
  ``block_last``   last doc_id per block  → WAND skip pointer,
  ``block_maxtf``  max tf per block       → block-max score bound,
  ``block_min_dl`` min dl per block       → tightens the bound (score is
                   decreasing in dl, so f(maxtf, mindl) upper-bounds the block),
  ``block_count``  postings per block,
  ``block_doc_off`` / ``block_tf_off`` / ``block_dl_off`` byte offsets.

Because every block's first doc_id is absolute, two encoded lists covering
disjoint ascending doc_id ranges merge by pure concatenation (byte-append +
offset shift) — this is what makes salted hot-term sub-segments (SURVEY §2
B4) mergeable without re-encoding.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

_U64 = np.uint64
_SEVEN = _U64(7)
_MASK7 = _U64(0x7F)


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array, fully vectorized (≤10 passes)."""
    a = np.ascontiguousarray(values, dtype=_U64)
    if a.size == 0:
        return b""
    lens = np.ones(a.size, dtype=np.int64)
    x = a >> _SEVEN
    while x.any():
        lens += (x > 0).astype(np.int64)
        x >>= _SEVEN
    starts = np.concatenate(([0], np.cumsum(lens[:-1])))
    out = np.zeros(int(lens.sum()), dtype=np.uint8)
    vals = a.copy()
    for k in range(int(lens.max())):
        mask = lens > k
        idx = starts[mask] + k
        byte = (vals[mask] & _MASK7).astype(np.uint8)
        cont = (lens[mask] > k + 1).astype(np.uint8)
        out[idx] = byte | (cont << 7)
        vals[mask] >>= _SEVEN
    return out.tobytes()


def varint_encode_offsets(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Like :func:`varint_encode` but also returns the per-value byte START
    offsets (length n+1, ``starts[-1] == len(blob)``) so callers can slice
    the stream at arbitrary value boundaries without re-encoding."""
    a = np.ascontiguousarray(values, dtype=_U64)
    if a.size == 0:
        return b"", np.zeros(1, dtype=np.int64)
    lens = np.ones(a.size, dtype=np.int64)
    x = a >> _SEVEN
    while x.any():
        lens += (x > 0).astype(np.int64)
        x >>= _SEVEN
    starts = np.zeros(a.size + 1, dtype=np.int64)
    np.cumsum(lens, out=starts[1:])
    out = np.zeros(int(starts[-1]), dtype=np.uint8)
    vals = a.copy()
    for k in range(int(lens.max())):
        mask = lens > k
        idx = starts[:-1][mask] + k
        byte = (vals[mask] & _MASK7).astype(np.uint8)
        cont = (lens[mask] > k + 1).astype(np.uint8)
        out[idx] = byte | (cont << 7)
        vals[mask] >>= _SEVEN
    return out.tobytes(), starts


def varint_decode(buf: bytes) -> np.ndarray:
    """Decode an LEB128 stream to uint64, fully vectorized."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=_U64)
    ends = np.nonzero((b & 0x80) == 0)[0]
    starts = np.concatenate(([0], ends[:-1] + 1))
    owner_start = np.repeat(starts, ends - starts + 1)
    shifts = ((np.arange(b.size) - owner_start) * 7).astype(_U64)
    parts = (b & 0x7F).astype(_U64) << shifts
    return np.add.reduceat(parts, starts)


def _blocked_varint(vals: np.ndarray, starts: np.ndarray,
                    ends: np.ndarray) -> tuple[bytes, np.ndarray]:
    parts = [varint_encode(vals[s:e]) for s, e in zip(starts, ends)]
    off = np.concatenate(([0], np.cumsum([len(p) for p in parts])[:-1])).astype(np.int64)
    return b"".join(parts), off


@dataclass
class EncodedPostings:
    df: int
    doc_blob: bytes
    tf_blob: bytes
    dl_blob: bytes
    block_last: np.ndarray     # int64 per block
    block_maxtf: np.ndarray    # int64 per block
    block_min_dl: np.ndarray   # int64 per block
    block_count: np.ndarray    # int32 per block
    block_doc_off: np.ndarray  # int64 byte offsets into doc_blob
    block_tf_off: np.ndarray   # int64 byte offsets into tf_blob
    block_dl_off: np.ndarray   # int64 byte offsets into dl_blob
    #: OPTIONAL positional index (None on position-less generations): one
    #: varint stream of token positions for every posting, doc-major; the
    #: posting's FIRST position is absolute, the rest are gaps, and the
    #: per-posting span is derived from tf (position count == tf), so no
    #: extra offset sidecar is needed.  This is the Lucene-proximity-data
    #: analog that makes phrase queries index-native (SURVEY §2 B7 ext;
    #: reference ES analyzed `text` mapping, MappingSetting.scala:13).
    pos_blob: bytes | None = None


def _empty() -> EncodedPostings:
    z = np.empty(0, dtype=np.int64)
    return EncodedPostings(0, b"", b"", b"", z, z, z, z.astype(np.int32), z, z, z)


def _pos_deltas(pos: np.ndarray, tfs: np.ndarray) -> np.ndarray:
    """Per-posting delta encoding of a doc-major flat position stream:
    leading position absolute, rest gaps (positions ascend within a doc)."""
    starts = np.cumsum(np.concatenate(([0], tfs[:-1])))
    deltas = np.empty(pos.size, dtype=np.int64)
    deltas[0] = pos[0]
    np.subtract(pos[1:], pos[:-1], out=deltas[1:])
    deltas[starts] = pos[starts]
    return deltas


def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray,
                    block_size: int = 128,
                    positions: np.ndarray | None = None) -> EncodedPostings:
    """Encode one posting list. ``doc_ids`` must be strictly ascending.
    ``positions``: optional flat int array of token positions, doc-major
    (``positions.size == tfs.sum()``, ascending within each doc)."""
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    dls = np.ascontiguousarray(dls, dtype=np.int64)
    n = doc_ids.size
    if n == 0:
        return _empty()
    n_blocks = (n + block_size - 1) // block_size
    block_starts = np.arange(n_blocks) * block_size
    block_ends = np.minimum(block_starts + block_size, n)
    # deltas, with block-leading positions reset to absolute doc_id
    deltas = np.empty(n, dtype=np.int64)
    deltas[0] = doc_ids[0]
    deltas[1:] = np.diff(doc_ids)
    deltas[block_starts] = doc_ids[block_starts]

    doc_blob, doc_off = _blocked_varint(deltas, block_starts, block_ends)
    tf_blob, tf_off = _blocked_varint(tfs, block_starts, block_ends)
    dl_blob, dl_off = _blocked_varint(dls, block_starts, block_ends)
    pos_blob = None
    if positions is not None:
        positions = np.ascontiguousarray(positions, dtype=np.int64)
        assert positions.size == int(tfs.sum()), \
            "positions must carry exactly tf values per posting"
        pos_blob = varint_encode(_pos_deltas(positions, tfs))
    return EncodedPostings(
        df=int(n),
        doc_blob=doc_blob,
        tf_blob=tf_blob,
        dl_blob=dl_blob,
        block_last=doc_ids[block_ends - 1],
        block_maxtf=np.maximum.reduceat(tfs, block_starts).astype(np.int64),
        block_min_dl=np.minimum.reduceat(dls, block_starts).astype(np.int64),
        block_count=(block_ends - block_starts).astype(np.int32),
        block_doc_off=doc_off,
        block_tf_off=tf_off,
        block_dl_off=dl_off,
        pos_blob=pos_blob,
    )


def decode_positions(enc: EncodedPostings,
                     tfs: np.ndarray | None = None) -> np.ndarray:
    """Decode the positional stream → flat int64 positions, doc-major
    (posting i owns the next ``tfs[i]`` values, ascending).  ``tfs`` may be
    passed when the caller already decoded the tf stream."""
    if enc.pos_blob is None:
        raise ValueError("posting list carries no positions "
                         "(generation built without store_positions)")
    if enc.df == 0:
        return np.empty(0, dtype=np.int64)
    if tfs is None:
        tfs = varint_decode(enc.tf_blob).astype(np.int64)
    deltas = varint_decode(enc.pos_blob).astype(np.int64)
    starts = np.cumsum(np.concatenate(([0], tfs[:-1])))
    csum = np.cumsum(deltas)
    carry = csum[starts] - deltas[starts]
    return csum - np.repeat(carry, tfs)


def decode_postings(enc: EncodedPostings) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode a full posting list → (doc_ids ascending, tfs, dls), int64."""
    if enc.df == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z.copy(), z.copy()
    deltas = varint_decode(enc.doc_blob).astype(np.int64)
    tfs = varint_decode(enc.tf_blob).astype(np.int64)
    dls = varint_decode(enc.dl_blob).astype(np.int64)
    counts = np.asarray(enc.block_count, dtype=np.int64)
    starts = np.cumsum(np.concatenate(([0], counts[:-1])))
    # per-block prefix sum: global cumsum minus the carry accumulated before
    # each block (block-leading deltas are absolute doc_ids, so the carry is
    # exactly cumsum_at_block_start - leading_value).
    csum = np.cumsum(deltas)
    carry = csum[starts] - deltas[starts]
    doc_ids = csum - np.repeat(carry, counts)
    return doc_ids, tfs, dls


def decode_block(enc: EncodedPostings, i: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode a single block (WAND skips blocks whose bound is too low)."""

    def span(off: np.ndarray, blob: bytes) -> bytes:
        s = int(off[i])
        e = int(off[i + 1]) if i + 1 < len(off) else len(blob)
        return blob[s:e]

    deltas = varint_decode(span(enc.block_doc_off, enc.doc_blob)).astype(np.int64)
    tfs = varint_decode(span(enc.block_tf_off, enc.tf_blob)).astype(np.int64)
    dls = varint_decode(span(enc.block_dl_off, enc.dl_blob)).astype(np.int64)
    return np.cumsum(deltas), tfs, dls


def concat_postings(parts: list[EncodedPostings]) -> EncodedPostings:
    """Merge encoded lists over DISJOINT ascending doc_id ranges by pure
    concatenation (the salted hot-term merge, SURVEY §2 B4).  Callers must
    pass parts ordered by doc_id range."""
    parts = [p for p in parts if p.df > 0]
    if not parts:
        return _empty()
    if len(parts) == 1:
        return parts[0]

    def shifted(offs: list[np.ndarray], blobs: list[bytes]) -> np.ndarray:
        shift = np.concatenate(([0], np.cumsum([len(b) for b in blobs[:-1]])))
        return np.concatenate([o + s for o, s in zip(offs, shift)])

    return EncodedPostings(
        df=int(sum(p.df for p in parts)),
        doc_blob=b"".join(p.doc_blob for p in parts),
        tf_blob=b"".join(p.tf_blob for p in parts),
        dl_blob=b"".join(p.dl_blob for p in parts),
        # positions stay concatenation-mergeable because every posting's
        # first position is absolute (delta scope = one posting)
        pos_blob=(b"".join(p.pos_blob for p in parts)
                  if all(p.pos_blob is not None for p in parts) else None),
        block_last=np.concatenate([p.block_last for p in parts]),
        block_maxtf=np.concatenate([p.block_maxtf for p in parts]),
        block_min_dl=np.concatenate([p.block_min_dl for p in parts]),
        block_count=np.concatenate([p.block_count for p in parts]),
        block_doc_off=shifted([p.block_doc_off for p in parts], [p.doc_blob for p in parts]),
        block_tf_off=shifted([p.block_tf_off for p in parts], [p.tf_blob for p in parts]),
        block_dl_off=shifted([p.block_dl_off for p in parts], [p.dl_blob for p in parts]),
    )


# --- whole-partition vectorized encoder -------------------------------------

def encode_partition_postings(shard: np.ndarray, term_code: np.ndarray,
                              doc_id: np.ndarray, tf: np.ndarray,
                              dl: np.ndarray, term_values,
                              block_size: int = 128,
                              pos: np.ndarray | None = None):
    """Encode EVERY posting list of a partition in one vectorized pass.

    Inputs are per-POSTING arrays sorted by ``(shard, term_code, doc_id)``
    (strictly ascending doc_id within a (shard, term) group) plus
    ``term_values``, a pyarrow StringArray mapping code -> term string.
    Returns a ``pyarrow.RecordBatch`` with the POSTINGS_DDL schema, built
    directly from buffers — zero per-term (and per-block) Python.

    This replaces calling :func:`encode_postings` once per term: the varint
    streams for ALL terms are produced by three whole-array passes and
    sliced at term boundaries, and the per-block sidecar arrays become
    pyarrow ListArrays assembled from offsets.  Measured ~20x less Python
    overhead than the per-group path on vocabulary-sized groups.
    """
    import pyarrow as pa

    n = doc_id.size
    if n == 0:
        return pa.RecordBatch.from_pylist([], schema=postings_arrow_schema())
    doc_id = np.ascontiguousarray(doc_id, dtype=np.int64)
    tf = np.ascontiguousarray(tf, dtype=np.int64)
    dl = np.ascontiguousarray(dl, dtype=np.int64)

    # term (= output row) boundaries
    new_term = np.empty(n, dtype=bool)
    new_term[0] = True
    new_term[1:] = (term_code[1:] != term_code[:-1]) | (shard[1:] != shard[:-1])
    t_start = np.nonzero(new_term)[0]                       # per term
    t_len = np.diff(np.append(t_start, n))
    n_terms = t_start.size

    # block boundaries (blocks never cross terms: every term start is a lead)
    pos_in_term = np.arange(n, dtype=np.int64) - np.repeat(t_start, t_len)
    block_lead = (pos_in_term % block_size) == 0
    b_idx = np.nonzero(block_lead)[0]                       # per block
    b_end = np.append(b_idx[1:], n)

    # deltas: gaps within a block, absolute doc_id at each block lead
    deltas = np.empty(n, dtype=np.int64)
    deltas[0] = doc_id[0]
    np.subtract(doc_id[1:], doc_id[:-1], out=deltas[1:])
    deltas[b_idx] = doc_id[b_idx]

    doc_blob, doc_starts = varint_encode_offsets(deltas)
    tf_blob, tf_starts = varint_encode_offsets(tf)
    dl_blob, dl_starts = varint_encode_offsets(dl)

    # per-term blob slices as BinaryArrays over ONE shared buffer
    t_bound = np.append(t_start, n)                          # len n_terms+1

    def bin_array(blob: bytes, starts: np.ndarray) -> pa.Array:
        offs = starts[t_bound]
        if offs[-1] <= np.iinfo(np.int32).max:
            return pa.BinaryArray.from_buffers(
                pa.binary(), n_terms,
                [None, pa.py_buffer(offs.astype(np.int32).tobytes()),
                 pa.py_buffer(blob)])
        return pa.LargeBinaryArray.from_buffers(
            pa.large_binary(), n_terms,
            [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(blob)])

    # per-block sidecars
    blk_last = doc_id[b_end - 1]
    blk_maxtf = np.maximum.reduceat(tf, b_idx)
    blk_mindl = np.minimum.reduceat(dl, b_idx)
    blk_count = (b_end - b_idx).astype(np.int32)
    term_of_blk_start = np.repeat(np.arange(n_terms), t_len)[b_idx]
    blk_doc_off = doc_starts[b_idx] - doc_starts[t_start][term_of_blk_start]
    blk_tf_off = tf_starts[b_idx] - tf_starts[t_start][term_of_blk_start]
    blk_dl_off = dl_starts[b_idx] - dl_starts[t_start][term_of_blk_start]

    # term -> [blocks] list offsets: first block index of each term
    first_blk = np.searchsorted(b_idx, t_start)
    list_offs = pa.array(np.append(first_blk, b_idx.size).astype(np.int32))

    def list_array(vals: np.ndarray, typ) -> pa.Array:
        return pa.ListArray.from_arrays(list_offs, pa.array(vals, type=typ))

    # optional positional stream: same three-whole-array-pass discipline —
    # one delta pass over the flat doc-major positions (posting-leading
    # values absolute), one varint pass, then per-term slices through the
    # posting→position boundary map (position count per posting == tf)
    if pos is not None:
        ppb = np.concatenate(([0], np.cumsum(tf)))      # posting → pos idx
        pos_blob, pos_starts = varint_encode_offsets(_pos_deltas(pos, tf))
        offs = pos_starts[ppb[t_bound]]
        if offs[-1] <= np.iinfo(np.int32).max:
            pos_arr = pa.BinaryArray.from_buffers(
                pa.binary(), n_terms,
                [None, pa.py_buffer(offs.astype(np.int32).tobytes()),
                 pa.py_buffer(pos_blob)])
        else:
            pos_arr = pa.LargeBinaryArray.from_buffers(
                pa.large_binary(), n_terms,
                [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(pos_blob)])
    else:
        pos_arr = pa.nulls(n_terms, type=pa.binary())

    terms = pa.compute.take(term_values, pa.array(term_code[t_start]))
    if pa.types.is_large_string(terms.type):
        terms = terms.cast(pa.string())
    return pa.RecordBatch.from_arrays(
        [pa.array(shard[t_start].astype(np.int32), type=pa.int32()),
         terms,
         pa.array(t_len.astype(np.int64), type=pa.int64()),
         bin_array(doc_blob, doc_starts),
         bin_array(tf_blob, tf_starts),
         bin_array(dl_blob, dl_starts),
         list_array(blk_last, pa.int64()),
         list_array(blk_maxtf.astype(np.int64), pa.int64()),
         list_array(blk_mindl.astype(np.int64), pa.int64()),
         list_array(blk_count, pa.int32()),
         list_array(blk_doc_off, pa.int64()),
         list_array(blk_tf_off, pa.int64()),
         list_array(blk_dl_off, pa.int64()),
         pos_arr],
        schema=postings_arrow_schema())


def postings_arrow_schema():
    import pyarrow as pa
    return pa.schema([
        ("shard", pa.int32()), ("term", pa.string()), ("df", pa.int64()),
        ("doc_blob", pa.binary()), ("tf_blob", pa.binary()),
        ("dl_blob", pa.binary()),
        ("block_last", pa.list_(pa.int64())),
        ("block_maxtf", pa.list_(pa.int64())),
        ("block_min_dl", pa.list_(pa.int64())),
        ("block_count", pa.list_(pa.int32())),
        ("block_doc_off", pa.list_(pa.int64())),
        ("block_tf_off", pa.list_(pa.int64())),
        ("block_dl_off", pa.list_(pa.int64())),
        ("pos_blob", pa.binary()),
    ])


# --- Spark-row (de)serialization helpers -----------------------------------

POSTINGS_FIELDS = (
    "term", "df", "doc_blob", "tf_blob", "dl_blob", "block_last",
    "block_maxtf", "block_min_dl", "block_count", "block_doc_off",
    "block_tf_off", "block_dl_off", "pos_blob",
)

# pos_blob is nullable: position-less generations (and pre-round-5 parquet,
# where the column is simply absent and reads back NULL) stay readable
POSTINGS_DDL = (
    "shard int, term string, df bigint, doc_blob binary, tf_blob binary, "
    "dl_blob binary, block_last array<bigint>, block_maxtf array<bigint>, "
    "block_min_dl array<bigint>, block_count array<int>, "
    "block_doc_off array<bigint>, block_tf_off array<bigint>, "
    "block_dl_off array<bigint>, pos_blob binary"
)


def enc_to_row(term: str, enc: EncodedPostings, shard: int | None = None) -> dict:
    d = {
        "term": term,
        "df": enc.df,
        "doc_blob": enc.doc_blob,
        "tf_blob": enc.tf_blob,
        "dl_blob": enc.dl_blob,
        "block_last": enc.block_last.tolist(),
        "block_maxtf": enc.block_maxtf.tolist(),
        "block_min_dl": enc.block_min_dl.tolist(),
        "block_count": enc.block_count.tolist(),
        "block_doc_off": enc.block_doc_off.tolist(),
        "block_tf_off": enc.block_tf_off.tolist(),
        "block_dl_off": enc.block_dl_off.tolist(),
        "pos_blob": enc.pos_blob,
    }
    if shard is not None:
        d["shard"] = shard
    return d


def row_to_enc(row) -> EncodedPostings:
    """Accepts a pandas Series / dict / pyspark Row with POSTINGS_FIELDS."""
    g = row.__getitem__
    try:  # absent on pre-round-5 rows; NULL on position-less generations
        pos = g("pos_blob")
    except (KeyError, IndexError, ValueError):
        pos = None
    return EncodedPostings(
        pos_blob=bytes(pos) if pos is not None else None,
        df=int(g("df")),
        doc_blob=bytes(g("doc_blob")),
        tf_blob=bytes(g("tf_blob")),
        dl_blob=bytes(g("dl_blob")),
        block_last=np.asarray(g("block_last"), dtype=np.int64),
        block_maxtf=np.asarray(g("block_maxtf"), dtype=np.int64),
        block_min_dl=np.asarray(g("block_min_dl"), dtype=np.int64),
        block_count=np.asarray(g("block_count"), dtype=np.int32),
        block_doc_off=np.asarray(g("block_doc_off"), dtype=np.int64),
        block_tf_off=np.asarray(g("block_tf_off"), dtype=np.int64),
        block_dl_off=np.asarray(g("block_dl_off"), dtype=np.int64),
    )
