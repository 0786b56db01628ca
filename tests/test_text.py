"""Text-analysis function family on handmade sentences."""

from __future__ import annotations

from pyspark.sql import functions as F

from oxi_diel_db_spark.functions import text as TX


def _one(spark, text, col):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(col.alias("v")).collect()[0]["v"]


def test_lang_id_real_sentences(spark):
    cases = {
        "the cat sat on the mat and looked to the door": "en",
        "der hund und die katze sind nicht das problem": "de",
        "le chat et la souris sont dans les champs": "fr",
        "el perro y los gatos que viven por una casa": "es",
        "xyzzy plugh 12345": "und",
    }
    for sentence, expected in cases.items():
        got = _one(spark, sentence, TX.lang_id(TX.norm_words(F.col("text"))))
        assert got == expected, f"{sentence!r}: {got} != {expected}"


def test_shingles(spark):
    got = _one(spark, "a b c d", TX.shingles(TX.norm_words(F.col("text")), 3))
    assert got == ["a b c", "b c d"]
    assert _one(spark, "a b", TX.shingles(TX.norm_words(F.col("text")), 3)) == []


def test_token_counts(spark):
    assert _one(spark, "hello world", TX.ws_token_count("text")) == 2
    # BPE-ish: 'hello' ',' 'world' '42' '!'
    assert _one(spark, "hello, world 42!", TX.token_count("text")) == 5


def test_quality_score_range_and_order(spark):
    good = "the quick brown fox and the lazy dog went to the market in town"
    bad = "!!! ??? ,,,"
    qg = _one(spark, good, TX.quality_score("text"))
    qb = _one(spark, bad, TX.quality_score("text"))
    assert 0.0 <= qb < qg <= 1.0


def test_fingerprint_order_insensitive(spark):
    a = _one(spark, "alpha beta gamma", TX.fingerprint("text"))
    b = _one(spark, "gamma alpha beta", TX.fingerprint("text"))
    c = _one(spark, "alpha beta delta", TX.fingerprint("text"))
    assert a == b != c


def test_redact_pii_all_categories(spark):
    s = (
        "mail bob.smith+x@corp.example.org node 192.168.1.17 "
        "ssn 123-45-6789 call 415-555-0100 ok"
    )
    out = _one(spark, s, TX.redact_pii("text"))
    assert out == "mail <EMAIL> node <IP> ssn <SSN> call <PHONE> ok"
    counts = spark.createDataFrame([(s,)], "text string").select(
        *[c.alias(n) for n, c in TX.pii_counts("text").items()]
    ).collect()[0]
    assert counts.asDict() == {"email": 1, "ip": 1, "ssn": 1, "phone": 1}


def test_redact_pii_leaves_clean_text_alone(spark):
    s = "version 3.14 of the thing shipped in 2024 at half past 12"
    assert _one(spark, s, TX.redact_pii("text")) == s


def test_repetition_filters_flag_degenerate_doc(spark):
    """'spam spam spam spam' has TTR 0.25 and top-word fraction 1.0 —
    the repetition thresholds must reject it while keeping varied
    text. Exercises the t7 signal algebra end-to-end on tiny input."""
    import __spark_entry__ as E

    import os, tempfile
    d = tempfile.mkdtemp()
    spark.createDataFrame(
        [
            (1, "spam spam spam spam"),
            (2, "the quick brown fox jumps over one lazy dog today"),
        ],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = {
        r["doc_id"]: r
        for r in E.queries()["t7_repetition_filters"](spark, d).collect()
    }
    assert out[1]["keep"] is False and out[1]["top_word_frac"] == 1.0
    assert out[2]["keep"] is True and out[2]["ttr"] == 1.0


def test_unigram_perplexity_orders_typicality(spark, sf_dir):
    """A doc made of the corpus's most common words must score lower
    perplexity than one made of its rarest words."""
    import pyspark.sql.functions as F

    from oxi_diel_db_spark.queries import load_registry

    out = load_registry()["t8_unigram_perplexity"].build(spark, sf_dir)
    rows = {r["doc_id"]: r for r in out.collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == docs
    vals = [r["ppl"] for r in rows.values() if r["ppl"] is not None]
    assert vals and all(v > 1.0 for v in vals)  # ppl >= vocab-floor > 1
    # xent and ppl are consistent
    some = next(iter(rows.values()))
    import math

    assert abs(some["ppl"] - math.exp(some["xent"])) < 1e-4 * some["ppl"]


def test_chunking_covers_every_word_once_per_window(spark, sf_dir):
    """Chunks tile each doc with size 64 / stride 48: reconstructing
    from non-overlap prefixes (first 48 of each chunk, all of the last)
    must yield the original word sequence."""
    import pyspark.sql.functions as F

    from oxi_diel_db_spark.functions import text as TX
    from oxi_diel_db_spark.queries import load_registry

    out = load_registry()["t9_chunking"].build(spark, sf_dir)
    chunks = {}
    for r in out.collect():
        chunks.setdefault(r["doc_id"], []).append((r["chunk_idx"], r["chunk_text"]))
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", TX.norm_words("text").alias("w")
    )
    for row in d.limit(50).collect():
        got = sorted(chunks.get(row["doc_id"], []))
        words = row["w"]
        if not words:
            assert not got
            continue
        rebuilt = []
        for i, (idx, textc) in enumerate(got):
            ws = textc.split(" ")
            rebuilt.extend(ws if i == len(got) - 1 else ws[:48])
        # trailing chunks overlap the previous one's tail; dedupe window
        assert rebuilt[: len(words)] == list(words)[: len(rebuilt)]
        assert set(" ".join(w for _, w in got).split()) == set(words)


def test_weighted_sample_prefers_heavy_docs(spark, sf_dir):
    import pyspark.sql.functions as F

    from oxi_diel_db_spark.queries import load_registry

    from oxi_diel_db_spark.operators.sampling import weighted_sample

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "n_chars")
    sample = weighted_sample(d, "doc_id", "n_chars", k=100, seed=11).collect()
    assert len(sample) == 100
    mean_sampled = sum(r["n_chars"] for r in sample) / len(sample)
    corpus_mean = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .agg(F.avg("n_chars"))
        .collect()[0][0]
    )
    # inclusion probability scales with n_chars -> sample skews long
    assert mean_sampled > corpus_mean
    # deterministic: the same ids on a re-run
    again = {r["doc_id"] for r in weighted_sample(d, "doc_id", "n_chars", k=100, seed=11).collect()}
    assert again == {r["doc_id"] for r in sample}


def test_ngram_udtf_polymorphic_schema(spark):
    """The analyze() static method must derive the schema from the
    constant n: n=2 -> (pos, w1, w2); n=4 -> (pos, w1..w4); and a
    non-constant/invalid n must be rejected at plan time."""
    import pytest

    from oxi_diel_db_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    spark.createDataFrame(
        [("the quick brown fox jumps",)], "text string"
    ).createOrReplaceTempView("ngram_probe")
    two = spark.sql(
        "SELECT g.* FROM ngram_probe, LATERAL ngram_explode(text, 2) g"
    )
    assert two.columns == ["pos", "w1", "w2"]
    assert two.count() == 4
    four = spark.sql(
        "SELECT g.* FROM ngram_probe, LATERAL ngram_explode(text, 4) g"
    )
    assert four.columns == ["pos", "w1", "w2", "w3", "w4"]
    rows = four.collect()
    assert rows[0]["w4"] == "fox" and rows[1]["w4"] == "jumps"
    with pytest.raises(Exception, match="positive integer|n must be"):
        spark.sql(
            "SELECT g.* FROM ngram_probe, LATERAL ngram_explode(text, 0) g"
        ).collect()


def test_t18_bpe_matches_pure_python(spark):
    """The distributed BPE learner must reproduce, merge for merge,
    a from-scratch single-machine BPE over the same corpus (sf0.001):
    same pair, same merged token, same weighted frequency, for all 10
    ranks — including the lexicographic tie-break."""
    from collections import Counter

    from oxi_diel_db_spark.queries import load_registry
    from oxi_diel_db_spark.queries._util import t

    sf = "/root/testdata/sf0.001"
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["freq"])
        for r in load_registry()["t18_bpe_merges"]
        .build(spark, sf)
        .orderBy("rank")
        .collect()
    ]

    texts = t(spark, sf, "documents").select("text").toPandas()["text"]
    import re as _re

    # the engine tokenizes with Java-regex \s+ (ASCII whitespace only
    # — NBSP is NOT a separator, matching DuckDB's RE2 \s); the Python
    # reference must replicate that, not str.split()'s Unicode set
    wfreq = Counter()
    for txt in texts:
        if txt:
            for w in _re.split(r"[ \t\n\r\f\v]+", txt.lower()):
                if w:
                    wfreq[w] += 1
    vocab = {tuple(list(w) + ["</w>"]): f for w, f in wfreq.items()}
    want = []
    for rank in range(1, 11):
        stats = Counter()
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                stats[(a, b)] += f
        if not stats:
            break
        # max freq, ties by lexicographic pair
        (l, r), pf = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        want.append((rank, l, r, l + r, pf))
        new_vocab = {}
        for syms, f in vocab.items():
            out, pend = [], None
            for x in syms:
                if pend == l and x == r:
                    out.append(l + r)
                    pend = None
                else:
                    if pend is not None:
                        out.append(pend)
                    pend = x
            if pend is not None:
                out.append(pend)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    assert got == want


def test_t22_compression_ratio_separates_repetition_from_prose(spark):
    """Planted signal: heavy repetition must land under the
    'repetitive' threshold, natural-ish prose between the thresholds,
    and random bytes above — and the scores must equal a direct
    driver-side zlib call (same level, same library)."""
    import random
    import zlib

    from oxi_diel_db_spark.queries import load_registry

    rng = random.Random(7)
    # prose needs a REAL vocabulary: a 12-word loop deflates below the
    # repetitive threshold itself (correctly!) — draw from a 200-word
    # pseudo-vocabulary so the ratio sits mid-band with margin
    vocab200 = [
        "".join(rng.choice("abcdefghijklmnopqrstuvwxyz")
                for _ in range(rng.randint(4, 9)))
        for _ in range(200)
    ]
    prose = " ".join(rng.choice(vocab200) for _ in range(400))
    rows = [
        (0, "spam " * 500),
        (1, prose),
        (2, "".join(chr(rng.randint(0x21, 0x10FF)) for _ in range(2000))),
    ]
    import os, tempfile
    out = tempfile.mkdtemp(prefix="t22_")
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(os.path.join(out, "documents.parquet"))
    got = {
        r["doc_id"]: r
        for r in load_registry()["t22_compression_ratio"]
        .build(spark, out)
        .collect()
    }
    assert got[0]["verdict"] == "repetitive"
    assert got[1]["verdict"] == "normal"
    assert got[2]["verdict"] == "high_entropy"
    for i, text in rows:
        raw = text.encode("utf-8")
        assert got[i]["ratio"] == round(len(zlib.compress(raw, 6)) / len(raw), 6)
        assert got[i]["n_bytes"] == len(raw)


# ---- t23: BPE application (r10 birth) -------------------------------------


def test_t23_token_accounting_matches_pure_python(spark):
    """Replay the full learn+apply pipeline in pure Python over the
    same sf0.001 corpus and compare every document's token counts —
    the same from-scratch-replay contract as t18's merge test."""
    import re
    from collections import Counter

    import duckdb

    from oxi_diel_db_spark.queries.llm_ops import t23_bpe_apply

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{sf}/documents.parquet')"
    ).fetchall()
    freq = Counter()
    doc_words = {}
    for doc_id, text in rows:
        ws = [w for w in re.split(r"\s+", text.lower()) if w]
        doc_words[doc_id] = ws
        freq.update(ws)
    vocab = {w: list(w) + ["</w>"] for w in freq}
    for _ in range(10):
        pc = Counter()
        for w, syms in vocab.items():
            f = freq[w]
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += f
        if not pc:
            break
        (l, r), _pf = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        for w, syms in vocab.items():
            out, pend = [], None
            for x in syms:
                if pend == l and x == r:
                    out.append(l + r)
                    pend = None
                else:
                    if pend is not None:
                        out.append(pend)
                    pend = x
            if pend is not None:
                out.append(pend)
            vocab[w] = out
    expect = {
        doc_id: (
            len(ws),
            sum(len(w) + 1 for w in ws),
            sum(len(vocab[w]) for w in ws),
        )
        for doc_id, ws in doc_words.items()
        if ws
    }
    got = {
        r["doc_id"]: (r["n_words"], r["n_syms_init"], r["n_tokens_bpe"])
        for r in t23_bpe_apply(spark, sf).collect()
    }
    assert got == expect


# ---- t24: HTML main-content extraction (r11 birth) ------------------------


def test_t24_block_classification(spark, tmp_path):
    """Pins every planted block's fate on a doc that carries ALL the
    boilerplate (doc_id 15 = ad div AND filler <p>): chrome dropped by
    the length floor, the ad div dropped by link density ALONE (it
    passes the floor), the filler by the floor alone, and exactly the
    headline + article text + related-links paragraph kept — with
    content_md5 recomputed in pure Python."""
    import hashlib

    from oxi_diel_db_spark.queries.llm_ops import t24_html_extract

    text15 = "word " * 30 + "final sentence of the article body"
    docs = [
        (15, text15),          # %3==0 and %5==0: ad + filler present
        (1, "short body " * 8),  # no ad, no filler
    ]
    pdf = spark.createDataFrame(
        [(i, s, "en", "test", len(s)) for i, s in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = str(tmp_path / "sf")
    pdf.write.parquet(sf + "/documents.parquet")
    out = {
        r["doc_id"]: r.asDict()
        for r in t24_html_extract(spark, sf).collect()
    }

    def expected(doc_id, text):
        squeezed = " ".join(text.split())
        return [
            f"Story {doc_id}: the full breaking report",
            squeezed,
            "Related: see our archive for more coverage of this"
            " developing story.",
        ]

    for doc_id, text in docs:
        kp = expected(doc_id, text)
        assert out[doc_id]["n_kept"] == 3
        assert out[doc_id]["extracted_chars"] == sum(len(x) for x in kp)
        assert out[doc_id]["content_md5"] == hashlib.md5(
            "\x1f".join(kp).encode()
        ).hexdigest()
    # doc 15 carries 2 extra planted boilerplate blocks (ad + filler):
    # they raise n_blocks but never n_kept
    assert out[15]["n_blocks"] == out[1]["n_blocks"] + 2


# ---- t25: URL canonicalization + dedup (r11 birth) ------------------------


def test_t25_canonicalization_rules(spark, tmp_path):
    """Pins every rule on hand-picked doc_ids: case folding, www./
    default-port strip, fragment drop, tracking-param drop, param
    SORT, trailing-slash trim — decorated variants of the same
    article collapse to ONE canonical form, while the %4==2 arm's
    REAL a/b params stay a distinct group (dropping too much is as
    wrong as dropping too little)."""
    from oxi_diel_db_spark.queries.llm_ops import t25_url_canonicalize

    # article key is doc_id % 20 and 4 | 20, so the %4 query arm is
    # FIXED per article class: ids {10,30,...,110} are all article 10
    # in the %4==2 arm with varying www/port/slash decoration (must
    # collapse to one canon), and {3,...,23} are article-id%20 docs in
    # the no-query arm with fragment/www decoration.
    ids = [10, 30, 50, 70, 90, 110, 3, 7, 11, 15, 19, 23]
    pdf = spark.createDataFrame(
        [(i, "x", "en", "t", 1) for i in ids],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = str(tmp_path / "sf")
    pdf.write.parquet(sf + "/documents.parquet")
    out = {
        r["doc_id"]: r.asDict()
        for r in t25_url_canonicalize(spark, sf).collect()
    }
    # ids 10,30,50,70,90,110: all %4==2 (b=2&a=1&id=k) and article
    # k = id % 20 ∈ {10, 30%20=10, 50%20=10, ...} → SAME article 10,
    # decorations differ (www on 30/90, port on 10/50/70/90/110 %5,
    # slash on evens): all collapse to one canonical URL with sorted
    # a=1&b=2&id=10
    canon10 = out[10]["canon_url"]
    assert canon10 == "http://site10.example.com/articles/10?a=1&b=2&id=10"
    group = [i for i in ids if out[i]["canon_url"] == canon10]
    assert sorted(group) == [10, 30, 50, 70, 90, 110]
    assert out[10]["n_members"] == 6 and out[10]["is_canonical"] == 1
    assert out[110]["is_canonical"] == 0
    # %4==3 arm (3,7,11,15,19,23): no query at all; article = id%20;
    # fragment dropped on 7 (%7==0); www dropped on 3/15 (%3==0)
    assert out[3]["canon_url"] == "http://site3.example.com/articles/3"
    assert out[7]["canon_url"] == "http://site7.example.com/articles/7"
    assert "#" not in out[7]["canon_url"]
    # 3 and 23 share article 3: 23 has no www, 3 does → same canon
    assert out[23]["canon_url"] == out[3]["canon_url"]
    assert out[3]["n_members"] == 2
    # https default-port strip: id 15 (%4=3 → scheme HTTP? 15%4=3 →
    # 'HTTP'; %5==0 adds :80) — port stripped
    assert ":" not in out[15]["canon_url"].split("//")[1]


def test_d22_registrable_extraction_and_blocklist_tiers(spark, tmp_path):
    """Pins the public-suffix extraction (2-label rule vs plain TLD,
    with and without a subdomain, case folded) and BOTH blocklist
    tiers on hand-picked doc_ids: the bench.* registrable-domain
    family, the wiki.co.uk specific domain, the exact-host entries
    (h35.news.com, h16.wiki.org), and clean docs that must survive."""
    from oxi_diel_db_spark.queries.llm_ops import d22_domain_blocklist

    # fixture residues: sub present iff id%3 != 0; org = id%7
    # (0 news, 1 blogs, 2 wiki, 3 bench, 4 data, 5 forum, 6 shop);
    # suffix = id%5 (0 com, 1 org, 2 co.uk, 3 github.io, 4 com.au)
    ids = [35, 16, 3, 17, 37, 30, 1, 44, 105]
    pdf = spark.createDataFrame(
        [(i, "x", "en", "t", 1) for i in ids],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = str(tmp_path / "sf")
    pdf.write.parquet(sf + "/documents.parquet")
    out = {
        r["doc_id"]: r.asDict()
        for r in d22_domain_blocklist(spark, sf).collect()
    }
    # 35: %3=2 sub h35, %7=0 news, %5=0 com → exact-host tier
    assert out[35]["host"] == "h35.news.com"
    assert out[35]["reg_domain"] == "news.com"
    assert out[35]["blocked"] == 1 and out[35]["rule"] == "h35.news.com"
    # 16: h16.wiki.org → the other exact-host entry (odd id → the raw
    # fixture is UPPERCASED; canonical host must fold it back)
    assert out[16]["host"] == "h16.wiki.org"
    assert out[16]["blocked"] == 1 and out[16]["rule"] == "h16.wiki.org"
    # 3: %3=0 no sub, %7=3 bench, %5=3 github.io → 2-label suffix
    # rule: registrable = bench.github.io → domain tier
    assert out[3]["host"] == "bench.github.io"
    assert out[3]["reg_domain"] == "bench.github.io"
    assert out[3]["blocked"] == 1 and out[3]["rule"] == "bench.github.io"
    # 17: h17.bench.co.uk → registrable bench.co.uk blocked even
    # though the HOST itself is in no list (the *.domain suffix match)
    assert out[17]["host"] == "h17.bench.co.uk"
    assert out[17]["reg_domain"] == "bench.co.uk"
    assert out[17]["blocked"] == 1 and out[17]["rule"] == "bench.co.uk"
    # 37: h37.wiki.co.uk → the specific wiki.co.uk domain entry
    assert out[37]["reg_domain"] == "wiki.co.uk"
    assert out[37]["blocked"] == 1
    # 30: wiki.com (no sub) — wiki is only blocked under co.uk
    assert out[30]["host"] == "wiki.com"
    assert out[30]["blocked"] == 0 and out[30]["rule"] == ""
    # 1: h1.blogs.org → clean, plain-TLD registrable
    assert out[1]["reg_domain"] == "blogs.org"
    assert out[1]["blocked"] == 0
    # 44: h44.wiki.com.au → 2-label suffix, clean
    assert out[44]["reg_domain"] == "wiki.com.au"
    assert out[44]["blocked"] == 0
    # 105: %3=0 no sub, %7=0 news, %5=0 com → news.com clean (only
    # the h35 SUBDOMAIN of news.com is blocked, not the domain)
    assert out[105]["host"] == "news.com"
    assert out[105]["blocked"] == 0


def test_d23_delta_hit_and_miss(spark, sf_dir):
    """The planted hit/miss contract from the d23 docstring: a delta
    naming a domain real fixture hosts carry must recall the exact
    shards holding those docs (cross-checked doc-by-doc against the
    d22 extraction and the p20 assignment), and a delta naming nothing
    must recall ZERO shards. Also pins the accounting invariants:
    blocked <= shard totals, and the registered fixture's miss rule
    ('quiet.net') adds nothing over the hitting rules alone."""
    import pyspark.sql.functions as F

    from oxi_diel_db_spark.queries.llm_ops import (
        _D23_DELTA_DOMAINS,
        _D23_DELTA_HOSTS,
        _d23_recall,
        d22_domain_blocklist,
        d23_retroactive_decontam,
        p20_shard_export,
    )

    # miss: a delta no fixture host can match
    miss = _d23_recall(spark, sf_dir, ("h9.none.net",), ("quiet.net",))
    assert miss.count() == 0

    # hit: one real domain; replay the expected recall independently
    hit = _d23_recall(spark, sf_dir, (), ("data.com",)).collect()
    assert hit, "delta hitting real hosts recalled no shards"
    blocked_ids = {
        r["doc_id"]
        for r in d22_domain_blocklist(spark, sf_dir)
        .filter(F.col("reg_domain") == "data.com")
        .collect()
    }
    assert blocked_ids
    exp = {
        r["doc_id"]: (r["split"], r["shard_id"], r["n_tok"])
        for r in p20_shard_export(spark, sf_dir).collect()
    }
    want = {}
    for d in blocked_ids:
        sp, sh, tok = exp[d]
        docs, toks = want.get((sp, sh), (0, 0))
        want[(sp, sh)] = (docs + 1, toks + tok)
    got = {
        (r["split"], r["shard_id"]): (r["blocked_docs"], r["blocked_tok"])
        for r in hit
    }
    assert got == want
    for r in hit:
        assert r["blocked_docs"] <= r["shard_docs"]
        assert r["blocked_tok"] <= r["shard_tok"]

    # the registered fixture: its miss rule contributes nothing
    reg_rows = {
        (r["split"], r["shard_id"]): (r["blocked_docs"], r["blocked_tok"])
        for r in d23_retroactive_decontam(spark, sf_dir).collect()
    }
    no_miss = {
        (r["split"], r["shard_id"]): (r["blocked_docs"], r["blocked_tok"])
        for r in _d23_recall(
            spark,
            sf_dir,
            _D23_DELTA_HOSTS,
            tuple(d for d in _D23_DELTA_DOMAINS if d != "quiet.net"),
        ).collect()
    }
    assert reg_rows == no_miss and reg_rows
