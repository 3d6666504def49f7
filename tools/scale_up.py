#!/usr/bin/env python3
"""Synthesize a larger benchmark scale factor from an existing one.

Bench-data tooling only (never engine code): replicates every table of a
source sf dir K times with key-shifting so the result scales the way a
genuinely larger dataset would:

- fact/dim keys map key -> key*K + copy, so FK joins stay 1:1 (copy c of
  an order references copy c of its customer) and key cardinality scales
  with the data instead of duplicating;
- region/nation stay fixed (dimensions that do not grow with data);
- document text gets a per-copy token suffix, so shingle/minhash spaces
  of different copies are DISJOINT: the corpus becomes K independent
  shards with the same internal near-dup rate as the source, not one
  giant artificial near-dup cluster per source doc (which would force
  quadratic candidate-pair blowup and make every dedup operator look
  super-linear for data reasons, not plan reasons);
- embeddings for copy>0 are fresh seeded unit vectors (decorrelated from
  their source row) for the same reason: replicated vectors would put K
  near-identical points in every LSH/IVF bucket;
- event ids/users shift like keys; timestamps keep the source window
  (same time range, K x denser — the "more users, same month" shape) with
  a +copy ns jitter so rows stay unique.

Usage: python3 tools/scale_up.py SRC_DIR DST_DIR K
e.g.   python3 tools/scale_up.py /root/testdata/sf0.1 bench_data/sf1 10
"""
import contextlib
import os
import re
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def shift(col: pa.ChunkedArray, k: int, c: int) -> pa.Array:
    a = col.combine_chunks()
    return pa.compute.add(pa.compute.multiply(a, k), c)


def scale_table(name: str, src: pa.Table, k: int, c: int) -> pa.Table:
    t = src
    if name in ("region", "nation"):
        return t if c == 0 else None
    key_cols = {
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "events": ["event_id", "user_id"],
        "documents": ["doc_id"],
        "embeddings": ["vec_id"],
    }.get(name, [])
    for col in key_cols:
        i = t.schema.get_field_index(col)
        t = t.set_column(i, t.schema.field(i), shift(t.column(col), k, c))
    if name == "events":
        i = t.schema.get_field_index("ts")
        ts = t.column("ts").combine_chunks().cast(pa.int64())
        jittered = pa.compute.add(ts, c).cast(t.schema.field(i).type)
        t = t.set_column(i, t.schema.field(i), jittered)
    if name == "documents" and c > 0:
        texts = [re.sub(r"(\S+)", rf"\1_{c}", x) if x is not None else None
                 for x in t.column("text").to_pylist()]
        ti = t.schema.get_field_index("text")
        t = t.set_column(ti, t.schema.field(ti), pa.array(texts, pa.string()))
        ni = t.schema.get_field_index("n_chars")
        t = t.set_column(ni, t.schema.field(ni),
                         pa.array([len(x) if x is not None else None
                                   for x in texts], pa.int64()))
    if name == "embeddings" and c > 0:
        ids = t.column("vec_id").to_pylist()  # already shifted
        dim = len(t.column("embedding")[0])
        vecs = []
        for vid in ids:
            rng = np.random.RandomState(vid % (2 ** 31))
            v = rng.normal(size=dim).astype(np.float32)
            vecs.append(v / np.linalg.norm(v))
        ei = t.schema.get_field_index("embedding")
        t = t.set_column(ei, t.schema.field(ei),
                         pa.array([v.tolist() for v in vecs],
                                  t.schema.field(ei).type))
    return t


def main() -> None:
    src_dir, dst_dir, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(dst_dir, exist_ok=True)
    for f in sorted(os.listdir(src_dir)):
        if not f.endswith(".parquet"):
            continue
        name = f[: -len(".parquet")]
        src = pq.read_table(os.path.join(src_dir, f))
        # Stream copy-by-copy through a ParquetWriter instead of
        # concat-then-write: the output is byte-for-byte the same row
        # order (copies 0..k-1 appended in order, one row group each),
        # but peak memory is ONE copy, not k — which is what lets
        # lineitem reach sf100 (600M rows) on this box.
        # Write to a temp name and rename on success: a mid-run failure
        # (e.g. OOM at sf100) must not leave a truncated footer-less file
        # where a later bench run expects a complete table — the old
        # concat-then-write failure mode left no output file at all, and
        # this preserves that property.
        out_rows = 0
        dst = os.path.join(dst_dir, f)
        tmp = dst + ".tmp"
        writer = pq.ParquetWriter(tmp, src.schema, compression="zstd")
        try:
            for c in range(k):
                part = scale_table(name, src, k, c)
                if part is None:
                    continue
                # preserve the SOURCE schema exactly (events keeps TIMESTAMP(NANOS))
                writer.write_table(part.cast(src.schema))
                out_rows += part.num_rows
            writer.close()
        except BaseException:
            # close() itself can raise here (footer flush on OOM/disk-full);
            # suppress so the ORIGINAL exception propagates and the temp
            # file is still removed either way
            with contextlib.suppress(Exception):
                writer.close()
            with contextlib.suppress(Exception):
                os.unlink(tmp)
            raise
        os.replace(tmp, dst)
        print(f"{name}: {src.num_rows} -> {out_rows}", flush=True)


if __name__ == "__main__":
    main()
