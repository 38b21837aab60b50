"""Megatron indexed-dataset writer (.bin/.idx pretraining shards), the
reference MegatronTokenizerWriter's on-disk contract
(io/writer/megatron_tokenizer.py:36-240; layout documented at :195-204 and
in Megatron-LM's indexed_dataset.py):

  .bin  concatenated per-document token arrays (uint16 when vocab fits in
        16 bits — dtype code 8 — else int32 — code 4), C order
  .idx  b"MMIDIDX\\x00\\x00" | uint64 version=1 | uint8 dtype code |
        uint64 sequence count | uint64 document count |
        int32 lengths[n] | int64 byte pointers[n] (cumulative, from 0) |
        int64 document indices[n+1] (0..n)

The reference tokenizes with HF AutoTokenizer (absent here); any object
with ``encode(text) -> list[int]`` plugs in — the vendored MiniBPE
(functions/bpe.py) by default. A reader is included so tests verify the
byte layout round-trips.
"""

from __future__ import annotations

import os
import shutil
import struct

import numpy as np

INDEX_HEADER = b"MMIDIDX\x00\x00"


def _dtype_for_vocab(vocab_size: int) -> tuple[np.dtype, int]:
    if vocab_size > np.iinfo(np.uint16).max + 1:
        return np.dtype(np.int32), 4
    return np.dtype(np.uint16), 8


def write_shard(
    texts: list[str],
    file_prefix: str,
    tokenizer,
    vocab_size: int,
    append_eod: bool = False,
    eod_token_id: int | None = None,
) -> dict:
    """Tokenize and write one .bin/.idx shard pair; returns shard stats."""
    token_dtype, dtype_code = _dtype_for_vocab(vocab_size)
    if append_eod and eod_token_id is None:
        append_eod = False  # reference: disable when the tokenizer has no eos
    lengths: list[int] = []
    with open(file_prefix + ".bin", "wb") as f:
        for text in texts:
            tokens = tokenizer.encode(text or "")
            if append_eod:
                tokens = [*tokens, eod_token_id]
            lengths.append(len(tokens))
            f.write(np.asarray(tokens, dtype=token_dtype).tobytes(order="C"))
    _write_idx(file_prefix, token_dtype.itemsize, dtype_code, lengths)
    return {
        "file_prefix": file_prefix,
        "num_docs": len(lengths),
        "num_tokens": int(sum(lengths)),
        "token_size": token_dtype.itemsize,
    }


def _write_idx(
    file_prefix: str, token_size: int, dtype_code: int, lengths: list[int]
) -> None:
    n = len(lengths)
    with open(file_prefix + ".idx", "wb") as f:
        f.write(INDEX_HEADER)
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<B", dtype_code))
        f.write(struct.pack("<Q", n))
        doc_indices = np.arange(n + 1, dtype=np.int64)
        f.write(struct.pack("<Q", len(doc_indices)))
        arr = np.asarray(lengths, dtype=np.int32)
        f.write(arr.tobytes(order="C"))
        pointers = np.zeros(n, dtype=np.int64)
        if n > 1:
            pointers[1:] = np.cumsum(arr[:-1], dtype=np.int64) * token_size
        f.write(pointers.tobytes(order="C"))
        f.write(doc_indices.tobytes(order="C"))


def read_shard(file_prefix: str) -> list[np.ndarray]:
    """Read back per-document token arrays (layout verification)."""
    with open(file_prefix + ".idx", "rb") as f:
        header = f.read(9)
        if header != INDEX_HEADER:
            raise ValueError(f"bad index header: {header!r}")
        (version,) = struct.unpack("<Q", f.read(8))
        if version != 1:
            raise ValueError(f"unsupported version {version}")
        (dtype_code,) = struct.unpack("<B", f.read(1))
        dtype = np.uint16 if dtype_code == 8 else np.int32
        (n,) = struct.unpack("<Q", f.read(8))
        struct.unpack("<Q", f.read(8))  # document count
        lengths = np.frombuffer(f.read(4 * n), dtype=np.int32)
        pointers = np.frombuffer(f.read(8 * n), dtype=np.int64)
    data = np.fromfile(file_prefix + ".bin", dtype=dtype)
    out = []
    item = np.dtype(dtype).itemsize
    for ln, ptr in zip(lengths, pointers):
        start = ptr // item
        out.append(data[start : start + ln])
    return out


def shard_stats_from_idx(file_prefix: str) -> dict:
    """Recover write_shard's stats dict from an existing .idx (used for
    idempotent task retries — same shard name implies same content
    digest, hence identical stats)."""
    with open(file_prefix + ".idx", "rb") as f:
        header = f.read(9)
        if header != INDEX_HEADER:
            raise ValueError(f"bad index header: {header!r}")
        struct.unpack("<Q", f.read(8))  # version
        (dtype_code,) = struct.unpack("<B", f.read(1))
        (n,) = struct.unpack("<Q", f.read(8))
        struct.unpack("<Q", f.read(8))  # document count
        lengths = np.frombuffer(f.read(4 * n), dtype=np.int32)
    return {
        "file_prefix": file_prefix,
        "num_docs": int(n),
        "num_tokens": int(lengths.sum()),
        "token_size": 2 if dtype_code == 8 else 4,
    }


def write_megatron(
    df,
    out_dir: str,
    merges: list,
    text_col: str = "text",
    append_eod: bool = False,
    eod_token_id: int | None = None,
):
    """Distributed shard writing: one .bin/.idx pair per partition via
    mapInPandas (the reference writes one pair per DocumentBatch), shard
    names unique per (partitionId, batch) with a content digest of the
    text bytes. Writes are idempotent: the digest is part of the shard
    name, so an existing complete shard at the same name has identical
    content — a Spark task retry or speculative attempt skips it and
    re-emits its stats instead of failing (a half-written shard from a
    crashed attempt is impossible because both files land via tmp+rename).
    Returns the manifest DataFrame (collect it to materialize the
    write)."""
    import os

    import pandas as pd

    from nemo_curator_spark.functions.bpe import MiniBPE

    os.makedirs(out_dir, exist_ok=True)
    vocab_size = 256 + len(merges)

    def fn(batches):
        import hashlib

        from pyspark import TaskContext

        tok = MiniBPE(merges)
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        for bi, pdf in enumerate(batches):
            if len(pdf) == 0:
                continue
            # Shard identity = (partition, batch-in-partition) + a content
            # digest over the actual text bytes AND the tokenizer config:
            # the idempotent skip below assumes same-name => identical
            # shard bytes, which only holds if the tokenization that
            # produced them is part of the name (rewriting the same
            # corpus with different merges/eod must NOT serve stale
            # shards). pdf.index is a RangeIndex (NOT doc ids) and
            # equal-length batches are the norm under Arrow's 10k-row
            # batching, so any length-derived name collides.
            h = hashlib.md5()
            h.update(
                repr((merges, vocab_size, append_eod, eod_token_id)).encode()
            )
            for t in pdf[text_col]:
                h.update((t or "").encode("utf-8", "surrogatepass"))
                h.update(b"\x00")
            prefix = os.path.join(
                out_dir, f"shard-{pid:05d}-{bi:04d}-{h.hexdigest()[:8]}"
            )
            if os.path.exists(prefix + ".bin") and os.path.exists(
                prefix + ".idx"
            ):
                # Same name => same content digest => identical shard.
                # Idempotent success for task retries / speculation.
                yield pd.DataFrame([shard_stats_from_idx(prefix)])
                continue
            # tmp+rename so a crashed attempt never leaves a half-shard
            # at the final name (attempt id keeps concurrent speculative
            # attempts from clobbering each other's tmp files).
            att = ctx.taskAttemptId() if ctx is not None else os.getpid()
            tmp = f"{prefix}.tmp{att}"
            stats = write_shard(
                pdf[text_col].tolist(), tmp, tok, vocab_size,
                append_eod, eod_token_id,
            )
            os.replace(tmp + ".bin", prefix + ".bin")
            os.replace(tmp + ".idx", prefix + ".idx")
            stats["file_prefix"] = prefix
            yield pd.DataFrame([stats])

    return df.mapInPandas(
        fn,
        schema="file_prefix string, num_docs long, num_tokens long, token_size int",
    )


# --- shard merge (reference utils/merge_file_prefixes.py:32-299) -----------
# The reference's simplified Megatron-LM merge_datasets port: concat
# .bin payloads in sorted-prefix order, merge the indices by extending
# sequence lengths and offsetting document indices by the running
# sequence count, then rewrite ONE index with recomputed byte pointers.
# Driver-side by design — the merge is a sequential byte concat whose
# output is a single file pair; at scale run it per output partition
# (one merged prefix per directory) rather than globally.


def extract_index_contents(idx_path: str):
    """merge_file_prefixes.py:32-76: (sequence_lengths,
    document_indices, token dtype) from an .idx; header/version
    asserted, dtype code 4 -> int32 else uint16."""
    with open(idx_path, "rb") as f:
        header = f.read(9)
        if header != INDEX_HEADER:
            raise ValueError(f"bad header, cannot read: {idx_path}")
        (version,) = struct.unpack("<Q", f.read(8))
        if version != 1:
            raise ValueError(f"bad version, cannot read: {idx_path}")
        (code,) = struct.unpack("<B", f.read(1))
        dtype = np.int32 if code == 4 else np.uint16
        (sequence_count,) = struct.unpack("<Q", f.read(8))
        (document_count,) = struct.unpack("<Q", f.read(8))
        sequence_lengths = np.frombuffer(
            f.read(4 * sequence_count), dtype=np.int32
        )
        f.read(8 * sequence_count)  # pointers — recomputed on write
        document_indices = np.frombuffer(
            f.read(8 * document_count), dtype=np.int64
        )
    return sequence_lengths, document_indices, dtype


def merge_file_prefixes(input_dir: str, output_prefix: str) -> dict:
    """merge_file_prefixes.py:236-299, exact: discover .bin/.idx pairs
    (either half missing raises), merge in sorted-prefix order, doc
    indices offset by the sequence count accumulated so far with the
    leading 0 of each subsequent index dropped. Returns stats."""
    prefixes = set()
    for basename in os.listdir(input_dir):
        prefix, ext = os.path.splitext(basename)
        if ext not in {".bin", ".idx"}:
            continue
        if prefix in prefixes:
            continue
        if not os.path.isfile(os.path.join(input_dir, basename)):
            continue
        ext_pair = ".bin" if ext == ".idx" else ".idx"
        if not os.path.isfile(os.path.join(input_dir, prefix + ext_pair)):
            raise AssertionError(
                f"ERROR: {ext_pair} file not provided for "
                f"{os.path.join(input_dir, prefix)}"
            )
        prefixes.add(prefix)
    if not prefixes:
        msg = f"ERROR: No valid file prefix pairs found in {input_dir}"
        raise ValueError(msg)

    all_lengths: list[np.ndarray] = []
    doc_indices: list[int] = [0]
    dtype = None
    seq_count = 0
    with open(output_prefix + ".bin", "wb") as out_bin:
        for prefix in sorted(prefixes):
            path_prefix = os.path.join(input_dir, prefix)
            lengths, docs, d = extract_index_contents(path_prefix + ".idx")
            if dtype is None:
                dtype = d
            elif d != dtype:
                raise AssertionError("mixed index dtypes in merge")
            all_lengths.append(lengths)
            doc_indices.extend((seq_count + docs)[1:].tolist())
            seq_count += len(lengths)
            with open(path_prefix + ".bin", "rb") as f:
                shutil.copyfileobj(f, out_bin)

    lengths = (
        np.concatenate(all_lengths) if all_lengths else np.array([], np.int32)
    )
    item = 4 if dtype == np.int32 else 2
    with open(output_prefix + ".idx", "wb") as f:
        f.write(INDEX_HEADER)
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<B", 4 if dtype == np.int32 else 8))
        f.write(struct.pack("<Q", len(lengths)))
        f.write(struct.pack("<Q", len(doc_indices)))
        f.write(np.asarray(lengths, dtype=np.int32).tobytes(order="C"))
        pointers = np.zeros(len(lengths), dtype=np.int64)
        if len(lengths) > 1:
            pointers[1:] = (
                np.cumsum(lengths[:-1], dtype=np.int64) * item
            )
        f.write(pointers.tobytes(order="C"))
        f.write(np.asarray(doc_indices, dtype=np.int64).tobytes(order="C"))
    return {
        "file_prefix": output_prefix,
        "num_shards": len(prefixes),
        "num_docs": int(len(lengths)),
        "num_tokens": int(lengths.sum()) if len(lengths) else 0,
    }
