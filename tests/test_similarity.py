"""Unit tests for the string-similarity kernels (F2)."""

import math

import pandas as pd
import pytest

from session_graph_spark.functions import similarity as S


def test_jaro_known_values():
    # classic textbook values
    assert math.isclose(S.jaro("martha", "marhta"), 0.944444, abs_tol=1e-5)
    assert math.isclose(S.jaro("dixon", "dicksonx"), 0.766667, abs_tol=1e-5)
    assert S.jaro("same", "same") == 1.0
    assert S.jaro("", "x") == 0.0
    assert S.jaro("abc", "xyz") == 0.0


def test_jaro_winkler_known_values():
    assert math.isclose(S.jaro_winkler("martha", "marhta"), 0.961111, abs_tol=1e-5)
    assert math.isclose(S.jaro_winkler("dwayne", "duane"), 0.84, abs_tol=1e-2)
    assert S.jaro_winkler("kubernetes", "kubernetes") == 1.0


def test_levenshtein_ratio():
    assert S.levenshtein_ratio("kitten", "sitting") == pytest.approx(1 - 3 / 7)
    assert S.levenshtein_ratio("abc", "abc") == 1.0
    assert S.levenshtein_ratio("", "abc") == 0.0
    assert S.levenshtein_ratio("dockr", "docker") == pytest.approx(1 - 1 / 6)


def test_jaccards():
    assert S.token_jaccard("apache spark", "apache kafka") == pytest.approx(1 / 3)
    assert S.trigram_jaccard("abc", "abc") == 1.0
    assert 0 < S.trigram_jaccard("kubernets", "kubernetes") < 1


def test_combined_score_separates_matches_from_confusables():
    positives = [
        ("kubernets", "kubernetes"), ("postgresq", "postgresql"),
        ("dockr", "docker"), ("tensorflw", "tensorflow"),
        ("elasticsearh", "elasticsearch"), ("graphqls", "graphql"),
        ("terafform", "terraform"), ("graffana", "grafana"),
        ("prometheos", "prometheus"), ("pydantics", "pydantic"),
        ("kotlyn", "kotlin"), ("ansibel", "ansible"),
        ("webpck", "webpack"), ("tailwnd", "tailwind"),
        ("typescripts", "typescript"), ("pyhton", "python"),
    ]
    negatives = [
        ("java", "javascript"), ("python", "pytorch"), ("react", "redis"),
        ("go", "graphql"), ("terraform", "tensorflow"),
        ("grafana", "graphql"), ("kotlin", "kubernetes"),
        ("rust", "redis"), ("nginx", "next.js"), ("ansible", "apache spark"),
    ]
    for a, b in positives:
        assert S.combined_score(a, b) >= S.MATCH_THRESHOLD, (a, b, S.combined_score(a, b))
    for a, b in negatives:
        assert S.combined_score(a, b) < S.MATCH_THRESHOLD, (a, b, S.combined_score(a, b))


def test_batch_kernel_matches_scalar():
    a = pd.Series(["kubernets", "java", "docker", None])
    b = pd.Series(["kubernetes", "javascript", "docker", "x"])
    got = S.combined_score_batch(a, b)
    assert got[2] == 1.0
    assert got[0] == pytest.approx(S.combined_score("kubernets", "kubernetes"))
    assert got[3] == S.combined_score("", "x")


def test_duckdb_kernel_bit_parity():
    """The er_clusters DuckDB oracle relies on DuckDB's
    jaro_winkler_similarity/levenshtein being bit-identical to our kernel
    (__spark_entry__.kernel_score_sql). Pin that claim on seeded random
    strings plus the curated positive/negative label pairs."""
    import random
    import string
    import sys

    import duckdb

    sys.path.insert(0, "/root/repo")
    from __spark_entry__ import kernel_score_sql, trigram_list_sql

    rng = random.Random(1234)
    alphabet = string.ascii_lowercase + " .-_0123456789"
    pairs = [
        ("kubernets", "kubernetes"), ("java", "javascript"),
        ("pyhton", "python"), ("apache spark", "apache kafka"),
        ("go", "graphql"), ("node.js", "nodejs"),
    ]
    for _ in range(500):
        a = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 16)))
        b = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 16)))
        if a != b:
            pairs.append((a, b))

    con = duckdb.connect()
    con.execute("CREATE TABLE p(a VARCHAR, b VARCHAR)")
    con.executemany("INSERT INTO p VALUES (?, ?)", pairs)
    sql = f"""
        WITH g AS (SELECT a, b, {trigram_list_sql('a')} AS ta,
                          {trigram_list_sql('b')} AS tb FROM p)
        SELECT a, b, {kernel_score_sql('a', 'b')} AS score FROM g"""
    for a, b, score in con.execute(sql).fetchall():
        assert score == S.combined_score(a, b), (a, b, score, S.combined_score(a, b))
