"""Scale smoke for the knn_label_confusion auto-switch: at n >> the exact
threshold, the IVF route must (a) finish much faster than exact all-pairs,
(b) agree with exact on almost every vector (multi-assign co-occurrence).

Usage: python tools/smoke_confusion.py [n_vecs] [dim] [n_labels]
"""
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray  # noqa: E402

n = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
dim = int(sys.argv[2]) if len(sys.argv) > 2 else 32
n_labels = int(sys.argv[3]) if len(sys.argv) > 3 else 8

ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 32)),
         include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext  # noqa: E402

DataContext.get_current().enable_progress_bars = False

from archivesspace_virgo_ray.pipelines.similarity import (  # noqa: E402
    knn_label_confusion,
)

# clustered blobs so 1-NN labels are meaningful (not uniform noise)
rng = np.random.default_rng(13)
centers = rng.standard_normal((n_labels, dim)) * 4
labels = rng.integers(0, n_labels, n)
emb = centers[labels] + rng.standard_normal((n, dim))
pdf = pd.DataFrame({
    "vec_id": np.arange(n, dtype=np.int64),
    "label": labels.astype(np.int64),
    "embedding": [row.astype(np.float32) for row in emb],
})


def run(mode, **kw):
    ds = ray.data.from_pandas(pdf).repartition(64)
    t0 = time.time()
    out = knn_label_confusion(ds, mode=mode, **kw)
    return time.time() - t0, out


t_ivf, m_ivf = run("ivf", replicas=3)  # auto n_centroids ~ sqrt(replicas·n)
print(f"ivf   n={n}: {t_ivf:.1f}s", flush=True)
t_exact, m_exact = run("exact")
print(f"exact n={n}: {t_exact:.1f}s", flush=True)
a = m_exact.set_index(["label", "nn_label"])["n"]
b = m_ivf.set_index(["label", "nn_label"])["n"]
joined = pd.concat([a, b], axis=1, keys=["exact", "ivf"]).fillna(0)
agree = float(np.minimum(joined["exact"], joined["ivf"]).sum()) / n
print(f"speedup={t_exact / t_ivf:.1f}x  cellwise_agreement={agree:.4f}")
ray.shutdown()
assert agree >= 0.98, agree
