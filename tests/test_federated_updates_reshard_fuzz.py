"""Hardening: (a) federation honors member tombstones exactly like one
combined index with the same deletes; (b) reshard byte-identity holds for
randomized corpora and layout pairs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from archivesspace_virgo_ray.index.build import BuildConfig, build_index
from archivesspace_virgo_ray.index.federated import FederatedSearcher
from archivesspace_virgo_ray.index.query import bm25_topk
from archivesspace_virgo_ray.index.reshard import reshard_index, segments_equal
from archivesspace_virgo_ray.index.update import delete_documents

CORPUS = "/root/testdata/sf0.001/documents.parquet"


def _cfg(s, b):
    return BuildConfig(n_shards=s, n_buckets=b, text_col="text",
                       id_col="doc_id", meta_cols=("lang", "source"))


def _q(texts, k=10):
    return pa.table({
        "query_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "k": pa.array([k] * len(texts), pa.int32()),
    })


def test_federated_honors_member_deletes(ray_session, tmp_path):
    t = pq.read_table(CORPUS)
    even = t.filter(pa.compute.equal(pa.compute.bit_wise_and(
        t["doc_id"], pa.scalar(1, pa.int64())), pa.scalar(0, pa.int64())))
    odd = t.filter(pa.compute.equal(pa.compute.bit_wise_and(
        t["doc_id"], pa.scalar(1, pa.int64())), pa.scalar(1, pa.int64())))
    pq.write_table(even, str(tmp_path / "even.parquet"))
    pq.write_table(odd, str(tmp_path / "odd.parquet"))
    a, b, c = (str(tmp_path / n) for n in ("ia", "ib", "ic"))
    build_index(str(tmp_path / "even.parquet"), a, _cfg(2, 4))
    build_index(str(tmp_path / "odd.parquet"), b, _cfg(2, 4))
    build_index(CORPUS, c, _cfg(2, 4))
    q = _q(["the data model"])
    before = FederatedSearcher([a, b]).topk(q).to_pandas()
    assert len(before) > 0
    # delete the top-1 doc from whichever member holds it, and from combined
    top = int(before.iloc[0]["doc_id"])
    delete_documents(a if top % 2 == 0 else b, [top])
    delete_documents(c, [top])
    got = FederatedSearcher([a, b]).topk(q).to_pandas()
    want = bm25_topk(c, q).to_pandas()
    assert top not in set(got["doc_id"])
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["score"].tolist() == want["score"].tolist()


def test_reshard_fuzz_layout_pairs(ray_session, tmp_path):
    rng = np.random.default_rng(11)
    vocab = ["aa", "bb", "cc", "the", "x1", "y2", "needle"]
    for it, (src_l, dst_l) in enumerate([((1, 2), (4, 4)),
                                         ((4, 8), (3, 5)),
                                         ((2, 2), (2, 2))]):
        n = int(rng.integers(40, 120))
        texts = [" ".join(rng.choice(vocab, rng.integers(1, 15)))
                 for _ in range(n)]
        df = pd.DataFrame({
            "doc_id": np.arange(n, dtype=np.int64) * 3 + 1,  # sparse ids
            "text": texts,
            "lang": ["en"] * n, "source": ["s"] * n,
        })
        src_p = str(tmp_path / f"c{it}.parquet")
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), src_p)
        a = str(tmp_path / f"a{it}")
        b = str(tmp_path / f"b{it}")
        c = str(tmp_path / f"c{it}")
        build_index(src_p, a, _cfg(*src_l))
        build_index(src_p, c, _cfg(*dst_l))
        reshard_index(a, b, n_shards=dst_l[0], n_buckets=dst_l[1])
        assert segments_equal(b, c), (it, src_l, dst_l)


def test_federated_after_member_delta_add(ray_session, tmp_path):
    """Add a delta generation to ONE member; the federated result must equal
    a fresh combined index over the union corpus (global stats fold the
    delta's df/total_len via the member's reseal)."""
    from archivesspace_virgo_ray.index.update import add_documents

    t = pq.read_table(CORPUS)
    even = t.filter(pa.compute.equal(pa.compute.bit_wise_and(
        t["doc_id"], pa.scalar(1, pa.int64())), pa.scalar(0, pa.int64())))
    odd = t.filter(pa.compute.equal(pa.compute.bit_wise_and(
        t["doc_id"], pa.scalar(1, pa.int64())), pa.scalar(1, pa.int64())))
    pq.write_table(even, str(tmp_path / "even.parquet"))
    pq.write_table(odd, str(tmp_path / "odd.parquet"))
    a, b, c = (str(tmp_path / n) for n in ("da", "db", "dc"))
    build_index(str(tmp_path / "even.parquet"), a, _cfg(2, 4))
    build_index(str(tmp_path / "odd.parquet"), b, _cfg(2, 4))
    delta = pd.DataFrame({
        "doc_id": [9000001, 9000003],
        "text": ["the data model grows nightly", "data stream delta doc"],
        "lang": ["en", "en"], "source": ["s", "s"],
    })
    import ray.data

    add_documents(ray.data.from_arrow(
        pa.Table.from_pandas(delta, preserve_index=False)), a, _cfg(2, 4))
    # combined index over even + delta + odd
    pq.write_table(pa.concat_tables(
        [even, pa.Table.from_pandas(
            delta[["doc_id", "text", "lang", "source"]],
            preserve_index=False).cast(pa.schema(
                [("doc_id", pa.int64()), ("text", pa.string()),
                 ("lang", pa.string()), ("source", pa.string())])), odd],
        promote_options="default"), str(tmp_path / "union.parquet"))
    build_index(str(tmp_path / "union.parquet"), c, _cfg(2, 4))
    q = _q(["the data model", "data stream delta"])
    got = FederatedSearcher([a, b]).topk(q).to_pandas()
    want = bm25_topk(c, q).to_pandas()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["score"].tolist() == want["score"].tolist()
    assert 9000001 in set(got["doc_id"]) or 9000003 in set(got["doc_id"])
