"""Text-analysis kernels: token count, shingles, quality, lang-id,
winnowing fingerprints."""

from __future__ import annotations

from pyspark.sql import functions as F

from doonop_spark.functions.text import (
    bpe_token_count_expr,
    lang_id_py,
    quality_score_expr,
    token_count_expr,
    winnow_fingerprint_py,
    word_shingles_expr,
)


def test_token_count(spark):
    df = spark.createDataFrame(
        [("a b  c",), ("",), ("   ",), ("one",)], "t string"
    )
    got = [r.n for r in df.select(token_count_expr(F.col("t")).alias("n")).collect()]
    assert got == [3, 0, 0, 1]


def test_bpe_token_count(spark):
    # letter runs, digit runs, single punctuation marks; whitespace free
    df = spark.createDataFrame(
        [
            ("hello world",),  # 2
            ("don't stop!",),  # don + ' + t + stop + ! = 5
            ("v2.0-rc1",),  # v + 2 + . + 0 + - + rc + 1 = 7
            ("",),  # 0
            ("   ",),  # 0
        ],
        "t string",
    )
    got = [
        r.n for r in df.select(bpe_token_count_expr(F.col("t")).alias("n")).collect()
    ]
    assert got == [2, 5, 7, 0, 0]


def test_word_shingles(spark):
    df = spark.createDataFrame([("a b c d",)], "t string")
    got = df.select(word_shingles_expr(F.col("t"), 3).alias("s")).first().s
    assert got == ["a b c", "b c d"]
    short = spark.createDataFrame([("a b",)], "t string")
    assert short.select(word_shingles_expr(F.col("t"), 3).alias("s")).first().s == ["a b"]
    empty = spark.createDataFrame([("",)], "t string")
    assert empty.select(word_shingles_expr(F.col("t"), 3).alias("s")).first().s == []


def test_quality_score(spark):
    rows = [
        ("The quick brown fox jumps over the lazy dog.", True),
        ("x", False),  # too short
        ("1234 5678 9012 3456", False),  # all digits
        ("a b", False),  # too few words
    ]
    df = spark.createDataFrame([(t,) for t, _ in rows], "t string")
    got = [r.q for r in df.select(quality_score_expr(F.col("t")).alias("q")).collect()]
    assert got == [e for _, e in rows]


def test_repetition_stats(spark):
    from doonop_spark.functions.text import repetition_stats

    rows = [
        # (text, n_lines, n_distinct_lines, n_2grams, top_2gram_n)
        ("a b a b a", 1, 1, 4, 2),   # "a b" x2, "b a" x2
        ("x\nx\n\ny", 3, 2, 2, 1),   # dup line, blank dropped; words x x y
        ("one two three", 1, 1, 2, 1),
        ("", 0, 0, 0, 0),
        ("   ", 0, 0, 0, 0),
        ("solo", 1, 1, 0, 0),
        ("r r r r", 1, 1, 3, 3),     # "r r" x3
    ]
    df = spark.createDataFrame([(t,) for t, *_ in rows], "t string")
    r = repetition_stats(F.col("t"))
    got = [
        (x.a, x.b, x.c, x.d)
        for x in df.select(
            r["n_lines"].alias("a"),
            r["n_distinct_lines"].alias("b"),
            r["n_2grams"].alias("c"),
            r["top_2gram_n"].alias("d"),
        ).collect()
    ]
    assert got == [tuple(e[1:]) for e in rows]


def test_token_vocab(spark):
    from doonop_spark.operators.vocab import token_vocab

    rows = [
        (0, "the cat and the dog"),
        (1, "the dog"),
        (2, "   "),   # blank: contributes no tokens
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.token: (r.n_occurrences, r.n_docs) for r in token_vocab(df, "doc_id", "text").collect()}
    assert out == {
        "the": (3, 2),
        "cat": (1, 1),
        "and": (1, 1),
        "dog": (2, 2),
    }
    assert {r.token for r in token_vocab(df, "doc_id", "text", min_occurrences=2).collect()} == {"the", "dog"}


def test_pii_scrub(spark):
    from doonop_spark.functions.text import pii_counts, scrub_pii_expr

    rows = [
        ("mail a.b+c@x-y.co.uk now", 1, 0, "mail <EMAIL> now"),
        ("from 192.168.0.1 and 10.0.0.255", 0, 2, "from <IP> and <IP>"),
        ("both u@h.io at 1.2.3.4", 1, 1, "both <EMAIL> at <IP>"),
        ("plain text, no pii", 0, 0, "plain text, no pii"),
        ("not an ip 1.2.3.4.5 still matches prefix", 0, 1,
         "not an ip <IP>.5 still matches prefix"),
        ("", 0, 0, ""),
    ]
    df = spark.createDataFrame([(t,) for t, *_ in rows], "t string")
    c = pii_counts(F.col("t"))
    got = [
        (r.e, r.i, r.s)
        for r in df.select(
            c["email"].alias("e"), c["ipv4"].alias("i"),
            scrub_pii_expr(F.col("t")).alias("s"),
        ).collect()
    ]
    assert got == [(e, i, s) for _, e, i, s in rows]


def test_lang_id():
    assert lang_id_py("the cat sat on the mat and it was good") == "en"
    assert lang_id_py("der Hund und die Katze ist nicht da") == "de"
    assert lang_id_py("le chat est dans la maison pour les vacances") == "fr"
    assert lang_id_py("") == "und"
    assert lang_id_py(None) is None


def test_lang_id_oracle_parity_adversarial():
    """The DuckDB oracle replays lang_id_py exactly — including the
    first-language-wins tie-break and whitespace/None edge cases the
    sf0.01 documents table (en/und only) never exercises."""
    import duckdb

    from __spark_entry__ import _lang_id_oracle_sql

    texts = [
        "the cat sat on the mat and it was good",
        "der Hund und die Katze ist nicht da",
        "le chat est dans la maison pour les vacances",
        "la la la",  # fr/es/it 3-way tie -> fr (first in marker order)
        "the der le el il",  # 5-way single-vote tie -> en
        "que por con una es",  # es outvotes fr on shared markers
        "di un per sono una del",
        "",  # empty -> und
        "   \t  ",  # whitespace-only -> und
        "zzz qqq xxx",  # no markers -> und
        None,  # null -> null
        "THE AND OF TO IS",  # case folding
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?)", [(t,) for t in texts])
    # per-row variant of the grouped oracle: same CTE, no GROUP BY
    per_row = _lang_id_oracle_sql()
    inner = per_row.split("WITH c AS (SELECT ", 1)[1]
    counts_sql, rest = inner.split(" FROM documents)", 1)
    guess_sql = rest.split("SELECT ", 1)[1].split(" AS lang_guess", 1)[0]
    rows = con.execute(
        f"WITH c AS (SELECT rowid AS i, {counts_sql} FROM documents) "
        f"SELECT {guess_sql} FROM c ORDER BY i"
    ).fetchall()
    got = [r[0] for r in rows]
    want = [lang_id_py(t) for t in texts]
    assert got == want


def test_documents_corpus_is_ascii(spark):
    """The XXH64-in-SQL and winnowing oracles read bytes as ord(substr)
    (1 char == 1 byte). That holds only for ASCII text; this guard turns a
    silent oracle divergence into a clear failure if the driver testdata
    ever gains non-ASCII documents."""
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    n_bad = docs.filter(F.col("text").rlike(r"[^\x00-\x7F]")).count()
    assert n_bad == 0


def test_xxh64_sql_matches_spark(spark):
    """The generated XXH64-in-SQL expression (oracle backbone for the
    MinHash/SimHash replays) is bit-identical to Spark's xxhash64 across
    every length class: empty, <4, <8, <32, stripe boundary (32/64),
    stripe+tail, and long inputs."""
    import duckdb

    from __spark_entry__ import _xxh64_sql

    strings = [
        "", "a", "ab", "abc", "abcd", "abcde", "abcdefg", "abcdefgh",
        "abcdefghi", "the quick brown fox", "x" * 31, "y" * 32, "z" * 33,
        "w" * 63, "v" * 64, "u" * 65, "t" * 100,
        "-123,456,789", "8442094316357006120,-55,1,0",
    ]
    want = [
        r.h
        for r in spark.createDataFrame([(s,) for s in strings], "s string")
        .select(F.xxhash64("s").alias("h"))
        .collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(s,) for s in strings])
    got = [r[0] for r in con.execute(f"SELECT {_xxh64_sql('s')} FROM t").fetchall()]
    assert got == want


def test_winnow_fingerprint_properties():
    a = winnow_fingerprint_py("the quick brown fox jumps over the lazy dog")
    b = winnow_fingerprint_py("the quick brown fox jumps over the lazy dog")
    assert a == b  # deterministic
    # robust to a small suffix edit: most fingerprints shared
    c = winnow_fingerprint_py("the quick brown fox jumps over the lazy cat")
    shared = len(set(a) & set(c))
    assert shared / len(a) > 0.5
    assert winnow_fingerprint_py("") == []
    assert winnow_fingerprint_py(None) is None


def test_lang_distribution_on_documents(spark):
    from doonop_spark.functions.text import lang_id_udf

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = docs.select(lang_id_udf("text").alias("lang")).groupBy("lang").count()
    langs = {r.lang for r in out.collect()}
    assert langs  # runs end-to-end over real data
