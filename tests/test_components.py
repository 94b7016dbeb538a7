"""Unit tests for connected-components dedup clustering
(`operators/dedup.py`): min-label propagation over near-dup pairs and
first-wins survivor selection. Reference analogue: fundus dedups by
exact URL only (src/fundus/scraping/crawler.py:447-450); content-level
clustering is the 100 TB generalization over verified LSH pairs.
"""

from __future__ import annotations

from fundus_spark.operators import connected_components, dedup_survivors


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "a long, b long")


def test_chain_converges_to_min_label(spark):
    # 0-1-2-3-4 chain: diameter 4 forces multiple propagation rounds
    pairs = _pairs(spark, [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11)])
    got = {(r.doc_id, r.cluster_id) for r in connected_components(pairs).collect()}
    assert got == {(0, 0), (1, 0), (2, 0), (3, 0), (4, 0), (10, 10), (11, 10)}


def test_pair_order_is_irrelevant(spark):
    # edges given high-to-low: label must still flow to the minimum
    pairs = _pairs(spark, [(4, 3), (3, 2), (2, 1), (1, 0)])
    got = {(r.doc_id, r.cluster_id) for r in connected_components(pairs).collect()}
    assert got == {(i, 0) for i in range(5)}


def test_empty_pairs_yield_empty_components(spark):
    pairs = _pairs(spark, []).limit(0)
    comp = connected_components(pairs)
    assert comp.count() == 0
    assert comp.columns == ["doc_id", "cluster_id"]


def test_survivors_keep_min_per_cluster_and_all_singletons(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(6)], "doc_id long, text string"
    )
    pairs = _pairs(spark, [(1, 3), (3, 5)])  # cluster {1,3,5} -> survivor 1
    out = dedup_survivors(docs, pairs)
    assert set(out.columns) == {"doc_id", "text", "cluster_id"}
    assert {r.doc_id for r in out.collect()} == {0, 1, 2, 4}


def test_survivors_shuffle_join_fallback_matches_broadcast(spark):
    """The size guard: above broadcast_max_rows the label join degrades
    to a plain shuffle join — identical result, no broadcast node."""
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(6)], "doc_id long, text string"
    )
    pairs = _pairs(spark, [(1, 3), (3, 5)])
    out = dedup_survivors(docs, pairs, broadcast_max_rows=0)
    assert {r.doc_id for r in out.collect()} == {0, 1, 2, 4}
    # no FORCED broadcast hint in the optimized plan (AQE may still
    # adaptively broadcast when the runtime size turns out small —
    # that is the desired behavior, not a guard failure)
    assert "broadcast" not in out._jdf.queryExecution().optimizedPlan().toString().lower()
    # and the default path does hint the broadcast
    hinted = dedup_survivors(docs, pairs)
    assert "broadcast" in hinted._jdf.queryExecution().optimizedPlan().toString().lower()


def test_incremental_assign_freezes_prior_partition(spark):
    """Append-only contract: new docs adopt frozen clusters (never
    displacing the frozen survivor), new-new components pull the min
    seed through bridges, and genuinely new content survives."""
    from fundus_spark.operators import incremental_assign

    base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    frozen = spark.createDataFrame(
        [
            (1, base),
            (2, "completely different text about spark optimizer internals and shuffle behavior"),
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (10, base),  # near-exact dup of frozen 1 -> adopts cluster 1
            (11, base.replace("lazy", "sleepy")),  # bridges to 10 -> same cluster
            (12, "totally unrelated fresh content with brand new words appearing only here"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.cluster_id, r.survives)
        for r in incremental_assign(new, frozen, k=3, threshold=0.2).collect()
    }
    assert out[10] == (1, False)
    assert out[11][0] == 1 and not out[11][1]
    assert out[12] == (12, True)
    # the frozen partition is untouched by construction: only new ids
    # are returned, so no frozen survivor can be demoted
    assert set(out) == {10, 11, 12}


def test_simhash_neardup_identical_docs_distance_zero(spark):
    from fundus_spark.operators import simhash_neardup_pairs

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),   # identical -> hamming 0
            (3, "totally different words entirely here now"),
        ],
        "doc_id long, text string",
    )
    rows = {(r.a, r.b): r.hamming for r in simhash_neardup_pairs(docs, bits=32, max_hamming=3).collect()}
    assert rows.get((1, 2)) == 0
    assert all(h <= 3 for h in rows.values())


def test_contamination_flags_counts_distinct_shared_grams(spark):
    from fundus_spark.operators import contamination_flags

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely novel words with no overlap present"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "quick brown fox jumps over")], "doc_id long, text string"
    )
    got = {r.doc_id: r.n_shared_grams for r in contamination_flags(corpus, bench, k=4).collect()}
    # bench 4-grams: 'quick brown fox jumps', 'brown fox jumps over'; both in doc 1
    assert got == {1: 2}


def test_components_raise_rather_than_return_partial_labels(spark):
    import pytest as _pytest

    from fundus_spark.operators import connected_components

    # diameter-4 chain cannot converge in 1 round
    pairs = _pairs(spark, [(0, 1), (1, 2), (2, 3), (3, 4)])
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_rounds=1).collect()


def test_simhash_neardup_bits64_production_config(spark):
    # the docstring-recommended production config: bit 63 is
    # Long.MIN_VALUE, unreachable via positive literals
    from fundus_spark.operators import simhash_neardup_pairs

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"), (3, "other words here now")],
        "doc_id long, text string",
    )
    rows = {(r.a, r.b): r.hamming for r in simhash_neardup_pairs(docs, bits=64, max_hamming=3).collect()}
    assert rows.get((1, 2)) == 0


def test_curate_corpus_respects_custom_id_col(spark):
    from fundus_spark.plans import curate_corpus

    docs = spark.createDataFrame(
        [
            (i, "s%d" % (i % 2), " ".join("w%d_%d" % (i, j) for j in range(30)))
            for i in range(8)
        ],
        "my_id long, source string, text string",
    )
    out = curate_corpus(docs, id_col="my_id", pack_budget=100)
    rows = out.select("my_id", "split", "pack_bin").collect()
    assert len(rows) == 8


def test_warc_reshard_round_trip_and_determinism(spark):
    """warc_reshard (round 5): records -> n fresh .warc.gz shards ->
    read back byte-identical (incl. non-ASCII bodies); shard bytes are
    DETERMINISTIC (mtime=0 gzip, URL-sorted members, portable md5
    bucketing), so a re-run and a reordered input produce the same
    payload bytes shard for shard."""
    from fundus_spark.operators import warc_extract, warc_reshard
    from pyspark.sql import functions as F

    rows = [
        (f"https://s{i % 3}.example/doc/{i}", "2024-01-0%dT00:00:00Z" % (i % 9 + 1),
         f"body {i} naïve café" if i % 4 else "")
        for i in range(40)
    ]
    records = spark.createDataFrame(rows, "url string, warc_date string, html string")

    shards = warc_reshard(records, n_shards=4).collect()
    assert sum(r.n_records for r in shards) == 40
    assert len({r.shard_id for r in shards}) == len(shards) <= 4

    # read back through the operator: byte-identical record payloads
    sh_df = spark.createDataFrame(
        [(str(r.shard_id), bytes(r.payload)) for r in shards], "source string, payload binary"
    )
    got = {
        (r.url, r.warc_date, r.html) for r in warc_extract(sh_df).collect()
    }
    assert got == set(rows)

    # determinism: same input (even reordered) -> same bytes per shard
    again = {r.shard_id: bytes(r.payload) for r in warc_reshard(records, n_shards=4).collect()}
    reordered = {
        r.shard_id: bytes(r.payload)
        for r in warc_reshard(records.orderBy(F.desc("url")), n_shards=4).collect()
    }
    first = {r.shard_id: bytes(r.payload) for r in shards}
    assert again == first == reordered


def test_c4_page_filter_rules(spark):
    """Each C4 rule in isolation: word minimum, terminal punctuation,
    sentence minimum, lorem-ipsum and curly-brace document rejects."""
    from fundus_spark.operators import c4_page_filter

    pages = [
        # 0: three good sentences -> keep
        (0, "alpha beta gamma delta epsilon one.\n"
            "alpha beta gamma delta epsilon two!\n"
            "alpha beta gamma delta epsilon three?"),
        # 1: lines long enough but no terminal punct -> all dropped
        (1, "alpha beta gamma delta epsilon one\n"
            "alpha beta gamma delta epsilon two"),
        # 2: punctuated but under the word minimum -> dropped lines
        (2, "too short one.\ntoo short two.\ntoo short three."),
        # 3: quote-terminated line kept, but 2 sentence terminators only
        (3, 'he said it was truly great "quoted"\n'
            "alpha beta gamma delta epsilon one.\n"
            "alpha beta gamma delta epsilon two."),
        # 4: lorem ipsum (case-insensitive) rejects the whole doc
        (4, "alpha beta gamma delta epsilon one.\n"
            "alpha beta gamma delta epsilon two.\n"
            "this has LoReM IpSuM inside it okay."),
        # 5: curly brace rejects the whole doc
        (5, "alpha beta gamma delta epsilon one.\n"
            "alpha beta gamma delta epsilon two.\n"
            "function f() { return 1; } extra words here."),
    ]
    df = spark.createDataFrame(pages, "doc_id long, page string")
    out = {r.doc_id: r for r in c4_page_filter(df).collect()}

    assert out[0].keep and out[0].n_kept_lines == 3 and out[0].n_sentences == 3
    assert not out[1].keep and out[1].n_kept_lines == 0 and out[1].kept_text == ""
    assert not out[2].keep and out[2].n_kept_lines == 0
    # quote counts for line-keep but not for the sentence terminator tally
    assert not out[3].keep and out[3].n_kept_lines == 3 and out[3].n_sentences == 2
    assert not out[4].keep and out[4].has_lorem_ipsum
    assert not out[5].keep and out[5].has_curly_brace
    # evidence columns are complete even on rejected docs
    assert out[4].n_kept_lines == 3 and out[4].n_sentences == 3


def test_c4_page_filter_is_zero_shuffle(spark):
    from fundus_spark.operators import c4_page_filter

    df = spark.createDataFrame([(1, "a b c d e ok.\nshort.")], "doc_id long, page string")
    plan = c4_page_filter(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_gopher_quality_filter_rules(spark):
    """Each Gopher rule in isolation (Rae et al. 2021 A1.1)."""
    from fundus_spark.operators import gopher_quality_filter

    good = "the quick brown words be to of and that have with more tokens here " * 5
    pages = [
        (0, good),                                    # passes everything
        (1, "the be to of short"),                    # word count < min
        (2, good + " ###########"),                   # symbol ratio
        (3, "\n".join(["• item one here"] * 19 + [good])),   # bullets > 90%
        (4, good + "\ntrailing thought goes on..."),  # ellipsis > 30% of 2 lines
        (5, good + " " + "123456 " * 40),             # alpha frac < 0.8
        (6, ("zz " * 70).strip()),                    # no stopwords
        (7, good + " " + "pneumonoultramicroscopicsilico " * 60),  # mean len > 10
    ]
    df = spark.createDataFrame(pages, "doc_id long, page string")
    out = {r.doc_id: r for r in gopher_quality_filter(df, min_words=50).collect()}

    assert out[0].keep
    assert not out[1].keep and out[1].n_words == 5
    assert not out[2].keep and out[2].symbol_word_ratio > 0.1
    assert not out[3].keep and out[3].frac_bullet_lines == 0.95
    assert not out[4].keep and out[4].frac_ellipsis_lines == 0.5
    assert not out[5].keep and out[5].frac_alpha_words < 0.8
    assert not out[6].keep and out[6].n_stopword_hits == 0
    assert not out[7].keep and out[7].mean_word_len > 10
    # evidence is complete on every row
    assert out[3].n_stopword_hits >= 2 and out[4].n_words >= 50


def test_gopher_quality_filter_is_zero_shuffle(spark):
    from fundus_spark.operators import gopher_quality_filter

    df = spark.createDataFrame([(1, "the of and words")], "doc_id long, page string")
    plan = gopher_quality_filter(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_sentence_span_dedup_first_occurrence_wins(spark):
    from fundus_spark.operators import sentence_span_dedup

    shared = "one shared. two shared! three shared?"
    pages = [
        (0, shared + " unique tail zero."),
        (1, shared + " unique tail one."),      # loses the shared triple
        (2, "totally distinct. second sentence! third here? fourth one."),
        (3, "short doc only two. sentences here!"),  # < span sentences
        (4, shared),                             # loses everything
    ]
    df = spark.createDataFrame(pages, "doc_id long, page string")
    out = {r.doc_id: r for r in sentence_span_dedup(df).collect()}

    assert out[0].n_removed == 0 and out[0].kept_text.startswith("one shared.")
    assert out[1].n_removed == 3 and out[1].kept_text == "unique tail one."
    assert out[2].n_removed == 0 and out[2].n_sentences == 4
    assert out[3].n_removed == 0 and out[3].n_sentences == 2
    assert out[4].n_removed == 3 and out[4].kept_text == ""


def test_sentence_span_dedup_intra_document(spark):
    """A span repeated INSIDE one document: first copy stays."""
    from fundus_spark.operators import sentence_span_dedup

    page = "alpha one. beta two! gamma three? alpha one. beta two! gamma three?"
    df = spark.createDataFrame([(7, page)], "doc_id long, page string")
    row = sentence_span_dedup(df).collect()[0]
    assert row.n_sentences == 6
    assert row.n_removed == 3
    assert row.kept_text == "alpha one. beta two! gamma three?"


def test_sentence_span_dedup_drops_trailing_fragment(spark):
    from fundus_spark.operators import sentence_span_dedup

    df = spark.createDataFrame(
        [(1, "complete sentence here. unterminated trailing fragment")],
        "doc_id long, page string",
    )
    row = sentence_span_dedup(df).collect()[0]
    assert row.n_sentences == 1 and row.kept_text == "complete sentence here."


def test_dup_substring_spans_localizes_shared_text(spark):
    from fundus_spark.operators import dup_substring_spans

    shared = "a long exactly duplicated run of characters"
    rows = [
        (0, "prefix zero " + shared + " suffix zero"),
        (1, "other start " + shared + " other end"),
        (2, "nothing in common with anybody else xyzzy"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dup_substring_spans(df, k=8, window=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)

    assert 0 in by_doc and 1 in by_doc
    # doc 2 shares nothing long enough
    assert 2 not in by_doc
    # the merged span in each doc covers the shared run (within
    # fingerprint granularity: boundaries may be up to k+window-2 loose)
    for d in (0, 1):
        spans = by_doc[d]
        cover = max(s.span_end for s in spans) - min(s.span_start for s in spans)
        assert cover >= len(shared) - (8 + 4 - 2)
        for s in spans:
            assert s.span_len == s.span_end - s.span_start + 1


def test_dup_substring_spans_detects_intra_doc_repeat(spark):
    from fundus_spark.operators import dup_substring_spans

    df = spark.createDataFrame(
        [(5, "unique head then repeated block repeated block tail")],
        "doc_id long, text string",
    )
    out = dup_substring_spans(df, k=8, window=4).collect()
    assert out and all(r.doc_id == 5 for r in out)


def test_sentence_span_dedup_wide_doc_ids_no_key_truncation(spark):
    """Round-7 ADVICE regression: the first-occurrence key used to be a
    12-char lpad of doc_id — Spark's lpad TRUNCATES longer input, so two
    13-digit ids sharing a duplicate span collided to the same key and
    the duplicate was silently kept in BOTH docs (n_removed=0). The
    struct-min key is exact over the whole long domain."""
    from fundus_spark.operators import sentence_span_dedup

    shared = "one shared. two shared! three shared?"
    a, b = 4_000_000_000_001, 4_000_000_000_002  # both lpad-truncate to '400000000000'
    df = spark.createDataFrame(
        [(a, shared + " tail a."), (b, shared + " tail b.")],
        "doc_id long, page string",
    )
    out = {r.doc_id: r for r in sentence_span_dedup(df).collect()}
    assert out[a].n_removed == 0 and out[a].kept_text.startswith("one shared.")
    assert out[b].n_removed == 3 and out[b].kept_text == "tail b."


def test_dup_substring_spans_window_gt_k_merges_one_region(spark):
    """Round-7 ADVICE regression: with window > k the island-merge gap
    must be max(k, window) — winnowing only guarantees consecutive
    selected positions within one duplicated region are <= window
    apart, so a gap threshold of k alone fragments a single duplicated
    region into several spans."""
    from fundus_spark.operators import dup_substring_spans

    shared = "this is one long exactly duplicated region of text that runs on for a while"
    rows = [
        (0, "zq alpha bravo xy " + shared + " um golf hotel vw"),
        (1, "jk india juliet pq " + shared + " rs mike once nb"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dup_substring_spans(df, k=4, window=12).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for d in (0, 1):
        # the duplicated region must surface as ONE merged span (with a
        # gap of only k it fragments: selected positions are up to
        # window=12 > k=4 apart inside the region)
        best = max(by_doc[d], key=lambda s: s.span_len)
        assert best.span_len >= len(shared) - (4 + 12 - 2), by_doc[d]


def test_c4_page_filter_blocklist_whole_word_case_insensitive(spark):
    from fundus_spark.operators import c4_page_filter

    rows = [
        (1, "a perfectly ordinary clean sentence right here. another fine sentence follows now. third one closes it out."),
        (2, "this page mentions CRAPOLA in loud caps today. another fine sentence follows now. third one closes it out."),
        (3, "crapshoot is not the blocked word at all. another fine sentence follows now. third one closes it out."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, page string")
    out = {r.doc_id: r for r in c4_page_filter(df, blocklist=["crapola", "verboten"]).collect()}
    assert not out[1].has_blocked_word and out[1].keep
    assert out[2].has_blocked_word and not out[2].keep
    # substring must NOT match: whole-word boundary
    assert not out[3].has_blocked_word and out[3].keep
    # no list -> rule inert, same schema
    out0 = {r.doc_id: r for r in c4_page_filter(df).collect()}
    assert not out0[2].has_blocked_word and out0[2].keep


def test_decontaminate_shuffle_fallback_equals_broadcast(spark):
    """Round-7: the contamination anti-join now carries the same
    broadcast guard + shuffle fallback as the rest of the chain.
    Forcing the fallback (broadcast_max_rows=0) must give the
    identical survivor set."""
    from fundus_spark.plans.curate import decontaminate

    docs = spark.createDataFrame(
        [(i, "document number %d talks about %s topics today" % (i, "benchmark secret" if i % 3 == 0 else "ordinary"))
         for i in range(30)],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "every benchmark secret topics today phrase lives here")],
        "doc_id long, text string",
    )
    kw = dict(text_col="text", id_col="doc_id", contamination_k=4)
    bc = {r.doc_id for r in decontaminate(docs, bench, **kw).collect()}
    sh = {r.doc_id for r in decontaminate(docs, bench, broadcast_max_rows=0, **kw).collect()}
    assert bc == sh
    assert bc and bc != {r.doc_id for r in docs.collect()}  # something was flagged


def test_remove_dup_substrings_keeps_first_occurrence(spark):
    """ExactSubstr removal (round 7): the corpus-wide first occurrence
    of a duplicated substring keeps its text; every later copy (cross-
    or intra-document) is cut, within fingerprint granularity (up to
    k+window-2 fringe chars survive)."""
    from fundus_spark.operators import remove_dup_substrings

    shared = "a long exactly duplicated run of characters here"
    rows = [
        (1, "prefix one " + shared + " suffix one"),
        (2, "other start " + shared + " other end"),
        (3, "totally unique content with nothing shared at all xyzzy"),
        (4, "intra repeat block repeat block repeat block intra tail wording"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in remove_dup_substrings(df, k=8, window=4).collect()}
    assert len(out) == 4  # every doc returned
    # first occurrence intact
    assert out[1].n_spans_removed == 0 and shared in out[1].kept_text
    # later copy cut (fringes may survive)
    assert out[2].n_spans_removed == 1 and shared not in out[2].kept_text
    assert out[2].n_chars_removed >= len(shared) - (8 + 4 - 2)
    assert out[2].kept_text.startswith("other start") and out[2].kept_text.endswith("other end")
    # untouched doc passes through byte-identical (normalized text)
    assert out[3].n_chars_removed == 0 and out[3].kept_text == rows[2][1]
    # intra-doc repeat keeps its first copy
    assert out[4].n_spans_removed >= 1
    assert "repeat block" in out[4].kept_text
    assert out[4].kept_text.count("repeat block") < 3
    # length accounting is consistent
    for r in out.values():
        assert r.n_chars == r.n_chars_removed + len(r.kept_text)


def test_remove_dup_substrings_adjacent_spans_merge(spark):
    """Two duplicated regions separated by less than the island gap
    merge into one removed span — and the rebuild still stitches the
    remaining segments in order."""
    from fundus_spark.operators import remove_dup_substrings

    blk = "duplicated block of text number "
    rows = [
        (1, "aa " + blk + "one and " + blk + "two zz"),
        (2, "bb " + blk + "one and " + blk + "two yy"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in remove_dup_substrings(df, k=8, window=4).collect()}
    # doc 1 keeps its FIRST copy; its own second copy is an intra-doc
    # duplicate and is cut
    assert out[1].n_spans_removed == 1
    assert out[1].kept_text.count(blk) == 1
    assert out[1].kept_text.startswith("aa " + blk + "one")
    # doc 2's copies are both non-first -> both cut
    assert out[2].n_spans_removed >= 1
    assert blk not in out[2].kept_text
    assert out[2].kept_text.startswith("bb")


def test_line_dedup_drops_every_copy_of_frequent_lines(spark):
    """Corpus-frequency line removal (round 7): template chrome keeps
    NO copy (unlike keep-first span dedup); unique lines and blanks
    pass through; n_lines/n_removed account exactly."""
    from fundus_spark.operators import line_dedup

    rows = [
        (1, "unique opener one\nCookie notice: accept all\nreal content alpha\nShare on FaceSpace"),
        (2, "unique opener two\nCookie notice: accept all\nreal content beta\nShare on FaceSpace"),
        (3, "standalone page\nwith only singular lines\n\n\nand blanks kept"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, page string")
    out = {r.doc_id: r for r in line_dedup(df, min_occurrences=2).collect()}
    assert out[1].kept_text == "unique opener one\nreal content alpha"
    assert out[2].kept_text == "unique opener two\nreal content beta"
    assert out[1].n_removed == out[2].n_removed == 2
    # blanks are never counted as frequent even though they repeat
    assert out[3].n_removed == 0 and out[3].kept_text == rows[2][1]
    # threshold respected: nothing frequent at min_occurrences=3
    out3 = {r.doc_id: r for r in line_dedup(df, min_occurrences=3).collect()}
    assert all(r.n_removed == 0 for r in out3.values())


def test_curate_corpus_optional_line_dedup_stage(spark):
    """Round-7 composition: line_dedup_min_occ strips corpus-recurrent
    boilerplate BEFORE the gate/dedup stages; default None keeps the
    chain byte-identical to before."""
    from pyspark.sql import functions as F

    from fundus_spark.plans import curate_corpus

    chrome = "Subscribe now and accept all cookies please"
    rows = [
        (i, "s%d" % (i % 2),
         chrome + "\n" + " ".join("unique%d_%d word" % (i, j) for j in range(15)))
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    base = curate_corpus(df, pack_budget=500)
    cleaned = curate_corpus(df, pack_budget=500, line_dedup_min_occ=2)
    assert base.count() == cleaned.count() == 12
    # the chrome line survives the default chain but not the cleaned one
    assert all(chrome in r.text for r in base.collect())
    assert all(chrome not in r.text for r in cleaned.collect())
    # default path unchanged: same packed output as before the feature
    again = curate_corpus(df, pack_budget=500)
    key = lambda r: (r.doc_id, r.split, r.pack_offset, r.pack_bin)  # noqa: E731
    assert sorted(map(key, base.collect())) == sorted(map(key, again.collect()))


def test_curate_corpus_optional_trained_quality_stage(spark):
    """Round-7 composition: quality_model gates the chain with the
    trained classifier between the heuristic gate and dedup; a
    bias-only keep-everything model leaves the output identical to
    the default chain, a fitted model drops what it scores low."""
    from pyspark.sql import functions as F

    from fundus_spark.operators import quality_classifier_fit
    from fundus_spark.operators.classifier import W_SCALE
    from fundus_spark.plans import curate_corpus

    rows = [
        (i, "s%d" % (i % 2),
         (" ".join("junkety%d_%d spam" % (i, j) for j in range(15))
          if i % 3 == 0
          else " ".join("prose%d_%d word" % (i, j) for j in range(15))))
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    base = curate_corpus(df, pack_budget=500)

    # keep-everything model: bias weight 1.0, all features 0
    keep_all = [0] * 16 + [W_SCALE]
    same = curate_corpus(df, pack_budget=500, quality_model=keep_all, quality_salt="t")
    key = lambda r: (r.doc_id, r.split, r.pack_offset, r.pack_bin)  # noqa: E731
    assert sorted(map(key, base.collect())) == sorted(map(key, same.collect()))

    # fitted model: learns the 'spam' token -> the i%3==0 docs drop
    labeled = df.withColumn(
        "y", (~F.array_contains(F.split(F.col("text"), " "), "spam")).cast("int")
    )
    model = quality_classifier_fit(
        labeled, n_features=32, n_iter=32, lr=0.0625, salt="t"
    )
    gated = curate_corpus(df, pack_budget=500, quality_model=model, quality_salt="t")
    kept_ids = {r.doc_id for r in gated.collect()}
    assert kept_ids == {i for i in range(12) if i % 3 != 0}


def test_curate_corpus_optional_ccnet_stage(spark):
    """Round-7 composition: ccnet_target tiers the corpus after exact
    dedup and drops the tail third; the kept set must equal the
    standalone ccnet_perplexity_buckets decision over the same
    post-dedup relation, and the default path stays byte-identical."""
    from pyspark.sql import functions as F

    from fundus_spark.operators.textstats import ccnet_perplexity_buckets
    from fundus_spark.plans import curate_corpus

    rows = [
        (i, "s%d" % (i % 2),
         (" ".join("the quick brown fox %d_%d jumps" % (i, j) for j in range(6))
          if i % 3 != 0
          else " ".join("zx%d_%d qq vv" % (i, j) for j in range(10))))
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    target = df.where(F.col("doc_id") % 3 == 1)  # clean prose slice

    base = curate_corpus(df, pack_budget=500)
    key = lambda r: (r.doc_id, r.split, r.pack_offset, r.pack_bin)  # noqa: E731
    again = curate_corpus(df, pack_budget=500)  # default path unchanged
    assert sorted(map(key, base.collect())) == sorted(map(key, again.collect()))

    tiered = curate_corpus(df, pack_budget=500, ccnet_target=target)
    kept_ids = {r.doc_id for r in tiered.collect()}
    base_ids = {r.doc_id for r in base.collect()}
    expected = {
        r["doc_id"]
        for r in ccnet_perplexity_buckets(
            df.where(F.col("doc_id").isin(*base_ids)), target
        ).collect()
        if r["tier"] != "tail"
    }
    assert kept_ids == expected
    assert kept_ids < base_ids  # the tail third actually dropped


def test_curate_corpus_optional_mojibake_repair_stage(spark):
    """Round-7 composition: repair_mojibake lets a mis-decoded copy of
    a clean doc exact-dedup against it; default off keeps the chain
    byte-identical."""
    from pyspark.sql import functions as F

    from fundus_spark.operators import make_mojibake
    from fundus_spark.plans import curate_corpus

    base_rows = [
        (i, "s0", "prose naïve café %d " % i + " ".join("w%d_%d" % (i, j) for j in range(12)))
        for i in range(6)
    ]
    clean = spark.createDataFrame(base_rows, "doc_id long, source string, text string")
    # corrupted twins of the same six docs, higher ids
    twins = clean.select(
        (F.col("doc_id") + 100).alias("doc_id"), "source", make_mojibake(F.col("text")).alias("text")
    )
    df = clean.unionByName(twins)

    default = curate_corpus(df, pack_budget=500)
    # without repair the corrupted twins share no bytes -> all 12 survive
    assert default.count() == 12
    repaired = curate_corpus(df, pack_budget=500, repair_mojibake=True)
    # with repair the twins exact-dedup (first-wins: low ids survive)
    assert {r.doc_id for r in repaired.collect()} == {i for i in range(6)}
    # default path unchanged
    again = curate_corpus(df, pack_budget=500)
    key = lambda r: (r.doc_id, r.split, r.pack_offset, r.pack_bin)  # noqa: E731
    assert sorted(map(key, default.collect())) == sorted(map(key, again.collect()))
