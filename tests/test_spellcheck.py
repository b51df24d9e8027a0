"""Spellcheck / did-you-mean: correct-word suppression, suggestion order,
collation, hopeless words."""

import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from archivesspace_virgo_ray.index.build import BuildConfig, build_index
from archivesspace_virgo_ray.index.spellcheck import collate, spellcheck

DOCS = [
    (1, "mode model modem node"),
    (2, "model model mode"),
    (3, "node code cove mode"),
    (4, "entirely unrelated words here"),
    (5, "mode node model modes"),
]


@pytest.fixture(scope="module")
def spell_idx(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("spell")
    docs_path = str(root / "docs.parquet")
    pq.write_table(
        pa.table({
            "doc_id": pa.array([d for d, _ in DOCS], pa.int64()),
            "text": pa.array([t for _, t in DOCS], pa.string()),
        }),
        docs_path,
    )
    idx = str(root / "idx")
    shutil.rmtree(idx, ignore_errors=True)
    build_index(
        docs_path, idx,
        BuildConfig(n_shards=2, n_buckets=4, text_col="text", id_col="doc_id",
                    meta_cols=()),
        resume=False,
    )
    return idx


def test_vocab_word_gets_no_suggestions(spell_idx):
    out = spellcheck(spell_idx, ["model"])
    assert len(out) == 0


def test_missing_word_suggestions_ordered(spell_idx):
    out = spellcheck(spell_idx, ["modle"], max_distance=2, max_suggestions=5)
    got = list(zip(out["suggestion"], out["dist"], out["df"]))
    # dist asc, then df desc, then term asc: "mode" is one deletion away
    # (dist 1); "model" (df=3) leads the dist-2 tier
    assert out["rank"].tolist() == list(range(1, len(out) + 1))
    dists = out["dist"].tolist()
    assert dists == sorted(dists)
    assert got[0][0] == "mode" and got[0][1] == 1
    d2 = [s for s, d, _ in got if d == 2]
    assert d2[0] == "model"


def test_self_row_never_suggested(spell_idx):
    # "modes" IS in the vocabulary -> suppressed entirely
    assert len(spellcheck(spell_idx, ["modes"])) == 0
    # a missing word never gets itself back
    out = spellcheck(spell_idx, ["mdoel"])
    assert "mdoel" not in set(out["suggestion"])


def test_hopeless_word_empty(spell_idx):
    assert len(spellcheck(spell_idx, ["qqqqzzzz"])) == 0


def test_collation_replaces_only_misspelled(spell_idx):
    words = ["model", "nod", "qqqqzzzz"]
    sug = spellcheck(spell_idx, words)
    fixed = collate(words, sug)
    parts = fixed.split()
    assert parts[0] == "model"          # correct word untouched
    assert parts[1] in {"node", "mode", "code"}  # corrected
    assert parts[2] == "qqqqzzzz"       # hopeless word untouched


def test_raw_word_column_preserved(spell_idx):
    out = spellcheck(spell_idx, ["Modle!"])
    if len(out):
        assert set(out["word"]) == {"Modle!"}
