"""Generate the golden VALUES oracle for the `global_shape_discords` query.

Spark-independent numpy replica of `operators/timeseries.py:
global_discords_gemm` semantics (m=8, exclusion=m, top_k=3): per
event_type, subsequences ordered by (ts, event_id) are z-normalized
(mean / population-var / divide, the identical vectorized float64 ops as
the Spark kernel), the all-pairs max cosine is computed by a slabbed
brute force (full row-vs-all GEMM — a superset of every grid cell, so the
max over cells equals this max), trivial matches |pos_i-pos_j| < m are
excluded, constant windows (var <= 1e-18) are dropped, and the top-3
discords per key are taken by (profile_d2 desc, pos asc).

profile_d2 = 2*m*(1 - max_cos) is emitted quantized to 1e-6
(round(d2 * 1e6) as bigint): BLAS fold-order wobble is O(1e-15) absolute
on d2 in [0, 4m], so the quantized value is engine-stable while remaining
a true value gate per the house float rule.

Run: python tools/golden_shape_discords.py  -> prints the VALUES rows for
sf0.001 / sf0.01 / sf0.1, each carrying the corpus-size discriminator the
oracle SQL dispatches on (WHERE sf_n = (SELECT count(*) FROM events)).
"""
from __future__ import annotations

import sys

import numpy as np
import pyarrow.parquet as pq

M = 8
TOP_K = 3


def discords_for_sf(path: str) -> list[tuple]:
    tbl = pq.read_table(path, columns=["event_type", "ts", "event_id", "value"])
    df = tbl.to_pandas()
    n_events = len(df)
    out = []
    for key, g in df.groupby("event_type", sort=True):
        g = g.sort_values(["ts", "event_id"], kind="mergesort").reset_index(drop=True)
        xs = g["value"].to_numpy(dtype=np.float64)
        # Spark unix_micros: normalize to datetime64[us] explicitly (pandas
        # preserves the parquet resolution, so a blind //1000 is wrong).
        ts_us = g["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        n = len(xs) - M + 1
        if n <= 0:
            continue
        # Subsequence matrix via stride tricks, then the kernel's exact
        # z-normalization ops (mean axis=1, population var, /sqrt(var*m)).
        Mx = np.lib.stride_tricks.sliding_window_view(xs, M).astype(np.float64)
        mu = Mx.mean(axis=1)
        var = ((Mx - mu[:, None]) ** 2).mean(axis=1)
        ok = var > 1e-18
        Z = (Mx[ok] - mu[ok][:, None]) / np.sqrt(var[ok] * float(M))[:, None]
        pos = (np.nonzero(ok)[0] + 1).astype(np.int64)  # 1-based row_number
        starts = ts_us[: n][ok]
        k = len(Z)
        mx = np.full(k, -np.inf)
        step = 512
        for lo in range(0, k, step):
            hi = min(lo + step, k)
            S = Z[lo:hi] @ Z.T
            near = np.abs(pos[lo:hi, None] - pos[None, :]) < M
            S[near] = -np.inf
            mx[lo:hi] = S.max(axis=1)
        keep = mx > -np.inf
        d2 = 2.0 * float(M) * (1.0 - mx[keep])
        p, s = pos[keep], starts[keep]
        order = np.lexsort((p, -d2))[:TOP_K]
        for i in order:
            out.append(
                (n_events, str(key), int(p[i]), int(s[i]),
                 int(np.round(d2[i] * 1e6)))
            )
    return out


def main() -> None:
    rows = []
    for sf in ("0.001", "0.01", "0.1"):
        rows.extend(discords_for_sf(f"/root/testdata/sf{sf}/events.parquet"))
    print("    FROM (VALUES")
    body = ",\n".join(
        f"      ({n}, '{k}', {p}, {s}, {d})" for n, k, p, s, d in rows
    )
    print(body)
    print("    ) AS t(sf_n, event_type, discord_pos, start_us, profile_d2_e6)")


if __name__ == "__main__":
    sys.exit(main())
