"""archivesspace_virgo_ray — a Ray-Data-native full-text index + document pipeline engine.

A from-scratch re-expression of the capabilities of uvalib/archivesspace-virgo
(reference at /root/reference) on Ray Data:

- ``index/``    : inverted-index build + Okapi BM25 (k1=1.2, b=0.75) top-k query
                  engine over a Parquet code corpus (the half the reference
                  delegates to Solr — see SolrHelper.java:82-96, :39-80).
- ``pipelines/``: the reference's document-preparation operators (field-map
                  projection, publish predicates, enrichment joins, dirty-set
                  expansion) plus large-scale training-data ops (dedup families,
                  similarity search, text analysis, multimodal plumbing).
- ``functions/``: vectorized scalar kernels (tokenize, hashing, natural-sort
                  keys, codecs).
- ``stages/``   : stateful actor-pool stage classes for ``map_batches``.
- ``state/``    : broadcast helpers for small dimension tables / global stats.

Nothing here calls ``ray.init()``: sessions are owned by the driver, bench.py,
or the test fixture.
"""

__version__ = "0.1.0"

# Stamped into segment manifests; changing index-affecting logic must bump this
# (the analog of the reference's XSLT md5 transform-hash invalidation,
# IndexRecordsForV4.java:44-64).
PIPELINE_VERSION = "avr-index-5"
