# -*- coding: utf-8 -*-
"""fix_mojibake (operators/textclean.py): exact repair of
Latin-1/CP1252-viewed UTF-8, byte-identical pass-through of clean
text, single-pass semantics, and the generator round-trip property."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _moji(s: str, codec: str = "latin-1") -> str:
    b = s.encode("utf-8")
    if codec == "cp1252":
        # WHATWG windows-1252: the five undefined bytes fall through
        # to their C1 control code points (what browsers produce)
        return "".join(
            bytes([x]).decode("cp1252", errors="strict")
            if x not in (0x81, 0x8D, 0x8F, 0x90, 0x9D)
            else chr(x)
            for x in b
        )
    return b.decode(codec)


def _fix(spark, texts):
    from fundus_spark.operators import fix_mojibake

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    return {r.doc_id: r for r in fix_mojibake(df).collect()}


def test_repairs_latin1_and_cp1252_mojibake(spark):
    originals = [
        "café au lait",                      # 2-byte sequences
        "naïve — résumé",                    # em dash is 3-byte
        "don’t “quote” me",                  # CP1252 curly punctuation
        "snow ☃ and 🎉 party",               # 3- and 4-byte (emoji)
        "ä ö ü ß € 中文 русский",             # mixed scripts + €
    ]
    # latin-1 view for pure-latin1-range output; cp1252 view for the rest
    texts = [_moji(originals[0]), _moji(originals[1], "cp1252"),
             _moji(originals[2], "cp1252"), _moji(originals[3], "cp1252"),
             _moji(originals[4], "cp1252")]
    out = _fix(spark, texts)
    for i, want in enumerate(originals):
        assert bool(out[i].was_fixed), (i, texts[i])
        assert out[i].fixed_text == want, (i, out[i].fixed_text, want)


def test_clean_text_passes_through_byte_identical(spark):
    texts = [
        "plain ascii only",
        "café au lait",          # REAL latin-1 text: é alone is not a
                                 # valid UTF-8 continuation -> untouched
        "中文 text with CJK",     # > U+00FF code points -> gate fails
        "",
        "   ",
    ]
    out = _fix(spark, texts)
    for i, t in enumerate(texts):
        assert not bool(out[i].was_fixed), (i, t)
        assert out[i].fixed_text == t


def test_null_text_stays_null(spark):
    from fundus_spark.operators import fix_mojibake

    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    r = fix_mojibake(df).collect()[0]
    assert r.fixed_text is None and not bool(r.was_fixed)


def test_single_pass_peels_one_layer_and_is_idempotent_on_clean(spark):
    from fundus_spark.operators import fix_mojibake

    original = "café"
    double = _moji(_moji(original))
    df = spark.createDataFrame([(1, double)], "doc_id long, text string")
    once = fix_mojibake(df).collect()[0]
    assert once.fixed_text == _moji(original) and bool(once.was_fixed)
    df2 = spark.createDataFrame([(1, once.fixed_text)], "doc_id long, text string")
    twice = fix_mojibake(df2).collect()[0]
    assert twice.fixed_text == original and bool(twice.was_fixed)
    df3 = spark.createDataFrame([(1, original)], "doc_id long, text string")
    clean = fix_mojibake(df3).collect()[0]
    assert clean.fixed_text == original and not bool(clean.was_fixed)


def test_generator_roundtrip_property(spark):
    """make_mojibake is the exact inverse of the repair for any
    string the hypothesis sampler can produce."""
    from fundus_spark.operators import fix_mojibake, make_mojibake

    texts = [
        "".join(chr(0x20 + (i * 7 + k * 13) % 0x2000) for k in range(12))
        for i in range(25)
    ] + ["🎉" * 3, "éé ôô űű", "aÿbĀc"]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    ).withColumn("text", make_mojibake(F.col("text")))
    fixed = {r.doc_id: r.fixed_text for r in fix_mojibake(df).collect()}
    for i, want in enumerate(texts):
        assert fixed[i] == want, (i, fixed[i], want)


def test_trailing_line_terminators_never_reach_the_decoder(spark):
    """Review finding: Java's $ matches BEFORE a final line terminator,
    so ^...$ anchoring let invalid byte sequences (dangling 0x85
    continuation, trailing U+2028/U+2029) through the gate and the
    decode threw MALFORMED_CHARACTER_CODING. With \\A...\\z these must
    all pass through untouched instead of crashing."""
    texts = [
        _moji("don’t", "cp1252") + "…",    # folded … -> dangling 0x85 tail
        _moji("café") + "",          # trailing NEL
        _moji("café") + " ",          # line separator, > U+00FF
        _moji("café") + " ",          # paragraph separator
        _moji("café") + "\n",              # trailing newline
    ]
    out = _fix(spark, texts)
    # none may crash; the \n case is still VALID utf8-as-latin1 (0x0a
    # is ASCII) so it repairs — the others must be left untouched
    assert out[4].fixed_text == "café\n" and bool(out[4].was_fixed)
    for i in (0, 1, 2, 3):
        assert out[i].fixed_text == texts[i], i
        assert not bool(out[i].was_fixed), i


def test_plan_is_zero_shuffle(spark):
    from fundus_spark.operators import fix_mojibake

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = fix_mojibake(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan
