"""Linalg + fixed-point-ANN scale probe.

Fixed-point PCA must cost ONE linear pass: ``int_moments`` ships
(d² + d + 1) integers per partition and nothing else; the eigensolve
is driver-side on those summaries, so its wall is
corpus-size-INDEPENDENT, and the projection is map-only. Expected
profile: total wall grows ~linearly with rows (scan-bound), the
driver solve stays constant, and the distributed moments are
bit-identical across partition layouts at every size (asserted).

The fixed-cells IVF (``ivf_topk_fixedcells`` — the value-oracled ANN
tier) must be scan-bound too: the k-means loop is broadcast-only
(vectors never shuffle, quantized corpus checkpointed once), probing
broadcasts nlist centroids, and candidate scoring touches
~nprobe/nlist of the corpus. nlist scales with √n like any IVF
provisioning.

Usage: python tools/scale_probe_linalg.py [row counts ...]
       (default: 20000 100000 500000)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time


def main() -> None:
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import numpy as np

    from flink_orc_sink_spark.operators.linalg import (
        int_moments,
        pca_project_fixedpoint,
        power_pca_components,
    )
    from flink_orc_sink_spark.operators.similarity import (
        ivf_topk_fixedcells,
    )
    from flink_orc_sink_spark.session import get_spark

    sizes = [int(a) for a in sys.argv[1:]] or [20_000, 100_000, 500_000]
    dim = 64
    spark = get_spark()
    spark.conf.set("spark.sql.shuffle.partitions", "16")

    for n in sizes:
        base = tempfile.mkdtemp(prefix="probe_linalg_")
        src = os.path.join(base, "emb")
        rng = np.random.default_rng(3)
        basis = np.linalg.qr(rng.standard_normal((dim, dim)))[0]
        scales = np.ones(dim) * 0.02
        scales[:4] = [0.4, 0.2, 0.1, 0.05]
        # write in chunks so the probe itself stays memory-bounded
        import pandas as pd

        chunk = 100_000
        for off in range(0, n, chunk):
            m = min(chunk, n - off)
            x = (rng.standard_normal((m, dim)) * scales) @ basis.T
            pdf = pd.DataFrame(
                {
                    "vec_id": np.arange(off, off + m, dtype=np.int64),
                    "embedding": list(x.astype(np.float64)),
                }
            )
            spark.createDataFrame(pdf).write.mode("append").parquet(src)
        df = spark.read.parquet(src)

        t0 = time.time()
        mom = int_moments(df, "embedding", dim)
        t_mom = time.time() - t0
        t0 = time.time()
        power_pca_components(*mom, dim, k=4)
        t_solve = time.time() - t0
        t0 = time.time()
        out = pca_project_fixedpoint(df, "vec_id", "embedding", dim, k=4)
        cnt = out.count()
        t_total = time.time() - t0
        assert cnt == n

        # layout invariance: the integer moments are bit-identical
        mom2 = int_moments(df.repartition(7), "embedding", dim)
        assert mom == mom2, f"moments differ across layouts at n={n}"

        nlist = max(16, int(n ** 0.5) // 4)
        queries = df.filter("vec_id < 10")
        t0 = time.time()
        hits = ivf_topk_fixedcells(
            queries, df, "vec_id", "vec_id", "embedding", "embedding",
            k=5, nlist=nlist, nprobe=8,
        ).count()
        t_ivf = time.time() - t0
        assert hits == 50

        print(
            f"rows={n:>9,}  moments={t_mom:6.1f}s  "
            f"driver-solve={t_solve:5.2f}s  full-project={t_total:6.1f}s"
            f"  ivf-fixed(nlist={nlist})={t_ivf:6.1f}s",
            flush=True,
        )
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
