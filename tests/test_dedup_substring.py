"""Closed-form contract for dedup_substring (Lee et al. ExactSubstr
semantics): every character span of length >= SUBSTR_K occurring more
than once anywhere in the corpus is accounted per doc, overlapping
spans merged, within-doc repetition included, sub-K docs untouched."""

from __future__ import annotations

import random


def _rand_unique(seed: int, n: int) -> str:
    # independent seeded streams over a 26-letter alphabet: a repeated
    # 30-gram across streams is impossible in practice and the strings
    # are deterministic, so the expectations below are stable
    rnd = random.Random(seed)
    return "".join(rnd.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(n))


def test_substring_dedup_closed_form(spark, tmp_path):
    from chi_frbcs_bigdatacs_spark.operators.dedup_near import (
        SUBSTR_K,
        q_dedup_substring,
    )

    assert SUBSTR_K == 30  # the expectations below are written for K=30
    s_shared = _rand_unique(1, 50).upper()  # 50 chars shared by docs 1+2
    s2 = _rand_unique(2, 35).upper()        # 35 chars shared by docs 5+6
    s3 = _rand_unique(3, 30).upper()        # 30 chars shared by docs 5+6
    docs = [
        # within-doc repetition: every 30-gram of A*100 is the same
        (0, "A" * 100),
        # one shared run mid-doc / at doc start
        (1, _rand_unique(4, 40) + s_shared + _rand_unique(5, 40)),
        (2, s_shared + _rand_unique(6, 60)),
        # fully unique, above K
        (3, _rand_unique(7, 50)),
        # below K: no grams at all
        (4, _rand_unique(8, 20)),
        # two separated shared runs -> two islands, order swapped
        (5, s2 + _rand_unique(9, 40) + s3),
        (6, s3 + _rand_unique(10, 45) + s2),
    ]
    # touching-spans case (review r12): doc 7 carries S1 immediately
    # followed by S2 (each 30 chars, shared with doc 8 where they are
    # SEPARATED) — doc 7's duplicated grams sit only at the two run
    # starts (the junction grams are unique to doc 7), producing spans
    # [41,70] and [71,100] that TOUCH without overlapping: one maximal
    # region of 60 chars, not two
    s4 = _rand_unique(11, 30).upper()
    s5 = _rand_unique(12, 30).upper()
    docs += [
        (7, _rand_unique(13, 40) + s4 + s5 + _rand_unique(14, 40)),
        (8, _rand_unique(15, 35) + s4 + _rand_unique(16, 40) + s5),
    ]
    df = spark.createDataFrame(
        [(i, t, "en", "test", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["doc_id"]: r
        for r in q_dedup_substring(spark, str(tmp_path)).collect()
    }
    assert len(out) == 9

    def spans(i):
        return (out[i]["n_dup_spans"], out[i]["dup_chars"])

    assert spans(0) == (1, 100) and out[0]["dup_frac"] == 1.0
    assert spans(1) == (1, 50)   # span [41, 90]
    assert spans(2) == (1, 50)   # span [1, 50]
    assert spans(3) == (0, 0) and out[3]["dup_frac"] == 0.0
    assert spans(4) == (0, 0)
    assert spans(5) == (2, 65)   # [1,35] + [76,105]
    assert spans(6) == (2, 65)   # [1,30] + [76,110]
    assert out[5]["dup_frac"] == round(65 / 105, 6)
    assert spans(7) == (1, 60)   # touching [41,70]+[71,100] -> ONE region
    assert spans(8) == (2, 60)   # the same runs, separated -> two

    # the consuming side: trim must cut EXACTLY the accounted spans
    from chi_frbcs_bigdatacs_spark.operators.dedup_near import (
        q_dedup_substring_trim,
    )

    trimmed = {
        r["doc_id"]: r
        for r in q_dedup_substring_trim(spark, str(tmp_path)).collect()
    }
    texts = dict(docs)
    assert trimmed[0]["clean_text"] == ""           # whole doc duplicated
    assert trimmed[1]["clean_text"] == texts[1][:40] + texts[1][90:]
    assert trimmed[2]["clean_text"] == texts[2][50:]
    assert trimmed[3]["clean_text"] == texts[3]     # untouched
    assert trimmed[4]["clean_text"] == texts[4]     # below K: untouched
    assert trimmed[5]["clean_text"] == texts[5][35:75]   # middle kept
    assert trimmed[6]["clean_text"] == texts[6][30:75]
    assert trimmed[7]["clean_text"] == texts[7][:40] + texts[7][100:]
    assert trimmed[8]["clean_text"] == texts[8][:35] + texts[8][65:105]
    for i, r in trimmed.items():
        assert r["clean_chars"] == len(r["clean_text"])
