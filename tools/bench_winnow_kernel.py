"""Kernel-level A/B for the winnow md5 gram hashing (VERDICT r15 #3):
per-gram Python md5 loop vs batch-level gram dedup (np.unique over the
uint64 gram view, md5 only the UNIQUE grams, scatter back).

No Spark — reads documents.parquet with pyarrow and runs both paths on
the raw text column, asserting bit-identical fingerprint sets per doc.

Usage: python tools/bench_winnow_kernel.py [/root/testdata/sf0.1] [passes]
"""

from __future__ import annotations

import re
import sys
import time

import numpy as np
import pyarrow.parquet as pq
from numpy.lib.stride_tricks import sliding_window_view

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from slurm2sql_spark.operators.textstats import _md5_ctor  # noqa: E402

K, W = 8, 4
WS = re.compile(r"[ \t\n\r\f]+")


def current_one(text, k=K, w=W):
    md5 = _md5_ctor()
    _fb = int.from_bytes
    if text is None:
        return None
    t = WS.sub(" ", text.lower())
    ng = len(t) - k + 1
    if ng < 1:
        return []
    if t.isascii():
        tb = t.encode()
        hashes = [_fb(md5(tb[i : i + k]).digest()[:4], "big") for i in range(ng)]
    else:
        hashes = [
            _fb(md5(t[i : i + k].encode()).digest()[:4], "big") for i in range(ng)
        ]
    if ng < w:
        return [min(hashes)]
    arr = np.asarray(hashes, dtype=np.int64)
    return np.unique(sliding_window_view(arr, w).min(axis=1)).tolist()


def batched(texts, k=K, w=W):
    """Batch path: one np.unique over every ASCII doc's grams."""
    md5 = _md5_ctor()
    _fb = int.from_bytes
    out = [None] * len(texts)
    bufs, idxs, counts = [], [], []
    for j, text in enumerate(texts):
        if text is None:
            continue
        t = WS.sub(" ", text.lower())
        ng = len(t) - k + 1
        if ng < 1:
            out[j] = []
            continue
        if t.isascii() and k == 8:
            bufs.append(np.frombuffer(t.encode(), np.uint8))
            idxs.append(j)
            counts.append(ng)
        else:
            hashes = [
                _fb(md5(t[i : i + k].encode()).digest()[:4], "big")
                for i in range(ng)
            ]
            arr = np.asarray(hashes, dtype=np.int64)
            out[j] = (
                [min(hashes)]
                if ng < w
                else np.unique(sliding_window_view(arr, w).min(axis=1)).tolist()
            )
    if bufs:
        grams = np.concatenate(
            [sliding_window_view(b, k) for b in bufs], axis=0
        )  # (N, 8) uint8, C-contiguous after concat
        keys = grams.view(np.uint64).ravel()
        uniq, inv = np.unique(keys, return_inverse=True)
        ub = uniq.tobytes()
        mv = memoryview(ub)
        uh = np.fromiter(
            (
                _fb(md5(mv[i : i + 8]).digest()[:4], "big")
                for i in range(0, len(ub), 8)
            ),
            np.int64,
            len(uniq),
        )
        all_h = uh[inv]
        off = 0
        for j, ng in zip(idxs, counts):
            arr = all_h[off : off + ng]
            off += ng
            if ng < w:
                out[j] = [int(arr.min())]
            else:
                out[j] = np.unique(
                    sliding_window_view(arr, w).min(axis=1)
                ).tolist()
        frac = len(uniq) / len(keys)
    else:
        frac = 1.0
    return out, frac


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    texts = pq.read_table(f"{sf}/documents.parquet", columns=["text"]).column(
        "text"
    ).to_pylist()
    print(f"{len(texts)} docs")

    t_cur = []
    for _ in range(passes):
        t0 = time.perf_counter()
        ref = [current_one(t) for t in texts]
        t_cur.append(time.perf_counter() - t0)

    # chunk sizes model the real kernel-call grain: fan_out over 32
    # cores hands ~len/32 docs per Arrow batch locally; 10k is the
    # arrow maxRecordsPerBatch grain a big scan would hand
    for chunk in (max(1, len(texts) // 32), len(texts)):
        t_new, fracs = [], []
        for _ in range(passes):
            t0 = time.perf_counter()
            new, fs = [], []
            for lo in range(0, len(texts), chunk):
                o, f = batched(texts[lo : lo + chunk])
                new.extend(o)
                fs.append(f)
            t_new.append(time.perf_counter() - t0)
            fracs = fs
        assert ref == new, "MISMATCH: batched kernel diverges from current"
        print(
            f"chunk={chunk}: current {min(t_cur):.3f}s  "
            f"batched {min(t_new):.3f}s  "
            f"speedup {min(t_cur) / min(t_new):.2f}x  "
            f"unique-gram frac {sum(fracs) / len(fracs):.3f}"
        )


if __name__ == "__main__":
    main()
