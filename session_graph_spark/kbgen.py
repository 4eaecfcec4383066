"""Deterministic large-scale gazetteer generation (round 5).

The reference links against a 4,774-entity Wikidata slice (README.md:
52-53); a production dimension is tens of thousands to millions of rows.
The curated 450-entry KB in operators/linking.py exercises every linker
rung precisely, but at toy collision density. This module generates a
realistic 20-50k-entry dimension — real-vocabulary compound labels,
acronym/vowel-stripped aliases, tech AND non-tech descriptions, and
multi-sense label collisions at natural (~8%) density — so the ladder,
the 0.8/0.5 description rungs, and the context re-ranker all run against
the collision statistics they would meet in the wild.

Everything is seeded-deterministic (random.Random), generated on the
driver in milliseconds, and broadcast-sized: 30k rows of short strings
is a few MB — the linker's broadcast-dim plan (linking.py:kb_df) is
unchanged, which is exactly the point the kb_link bench proves (link
time flat from 450 to 30k entries).

Invariants (mirroring the curated table's, linking.py:55-66):
- labels/aliases lowercase, no apostrophes;
- for a multi-sense label the TECH sense always has the LOWER kb id, so
  the context-free tie-break picks it (generated ids kbx:1xxxx sort
  below their non-tech twins kbx:9xxxx, and every generated id sorts
  above every curated kb:0xxx id);
- generated labels/aliases never collide with curated labels/aliases
  (filtered), so a superset dimension links curated labels identically.
"""

from __future__ import annotations

import random

from session_graph_spark.operators.linking import KB_ENTRIES, TECH_KEYWORDS

GENERATOR_VERSION = 1

_PARTS_A = (
    "data stream cache graph vector query index shard batch flux grid "
    "node pipe sync meta hyper terra nimbus quill ember lattice prism "
    "cobalt onyx argon zephyr delta raven atlas comet krypton magnet "
    "turbo echo nova pixel cedar granite summit harbor beacon cipher "
    "falcon lumen quartz rapid saga tidal umber vortex willow xenon"
).split()

_PARTS_B = (
    "base store kit flow forge hub lab stack mesh wave core gen scale "
    "link press pulse works den port ward shed mill loft vault field "
    "craft smith line path drive spark dash mark point gate bridge"
).split()

_CATEGORIES = (
    "toolkit engine framework server client gateway daemon compiler "
    "runtime scheduler registry broker planner optimizer balancer "
    "emulator validator formatter indexer crawler"
).split()

_TECH_ADJ = (
    "distributed embedded lightweight declarative realtime columnar "
    "streaming modular asynchronous fault-tolerant high-throughput "
    "typed reactive serverless incremental"
).split()

_TECH_DOMAIN = (
    "analytics telemetry inference ingestion replication scheduling "
    "indexing routing caching observability provisioning deduplication"
).split()

# non-tech sense vocabulary: none of these words (or their compositions)
# may CONTAIN a TECH_KEYWORD substring, or the 0.5 rung silently becomes
# 0.8 — asserted at generation time
_NONTECH_NOUN = (
    "ballad orchard meadow harvest festival pottery textile guild "
    "constellation deity myth river trail village harbor garden folk "
    "dance lantern tapestry"
).split()

_NONTECH_ADJ = (
    "ancient alpine coastal medieval nordic pastoral rustic seasonal "
    "ceremonial wandering"
).split()

# fixed words the non-tech description templates add around the
# vocabularies (generate_kb_rows)
_NONTECH_TEMPLATE_WORDS = ("from", "regional", "folklore", "of", "lore")


def _validate_nontech_vocab() -> None:
    """The 0.5-rung contract is substring-based (linking._tech_keyword_hit):
    a non-tech description that CONTAINS a tech keyword silently promotes
    that sense to the 0.8 rung. Validated ONCE at import time with a loud
    ValueError (an assert would vanish under python -O) instead of
    rescanning every generated row: non-tech descriptions are space-joined
    compositions of these fixed vocabularies, so as long as no keyword
    contains a space, a keyword substring in any composed description
    implies a keyword substring in one of the composed words."""
    spaced = [kw for kw in TECH_KEYWORDS if " " in kw]
    if spaced:
        raise ValueError(
            f"TECH_KEYWORDS with spaces {spaced} can span description "
            "word boundaries; kbgen's import-time vocabulary check no "
            "longer covers them — reinstate a per-row description scan")
    words = set(_NONTECH_NOUN) | set(_NONTECH_ADJ) | set(_NONTECH_TEMPLATE_WORDS)
    bad = [(w, kw) for w in sorted(words) for kw in TECH_KEYWORDS if kw in w]
    if bad:
        raise ValueError(
            f"non-tech vocabulary words contain tech keywords {bad}; "
            "descriptions built from them would silently promote the "
            "0.5 rung to 0.8")


_validate_nontech_vocab()


def _fused(i: int) -> str:
    """Unique fused base name for index i (mixed-radix over the part
    vocabularies, category word appended past the two-part space)."""
    a = _PARTS_A[i % len(_PARTS_A)]
    j = i // len(_PARTS_A)
    b = _PARTS_B[j % len(_PARTS_B)]
    c = j // len(_PARTS_B)
    name = a + b
    if c > 0:
        name = f"{name} {_CATEGORIES[(c - 1) % len(_CATEGORIES)]}"
        if c > len(_CATEGORIES):
            raise ValueError("label space exhausted; grow the vocabularies")
    return name


def _acronym(label: str) -> str:
    words = label.split()
    if len(words) >= 2:
        return "".join(w[0] for w in words)
    return "".join(ch for ch in label if ch not in "aeiou")[:7]


def generate_kb_rows(n: int = 30000, seed: int = 7,
                     ambiguous_frac: float = 0.08,
                     nontech_frac: float = 0.06,
                     ) -> list[tuple[str, str, str, list[str]]]:
    """n synthetic gazetteer rows appended to the curated KB_ENTRIES.

    Mix: ~(1 - nontech_frac - ambiguous_frac) tech entries (exact -> 1.0
    rung, alias -> 0.8 rung), ~nontech_frac alias-reachable non-tech
    entries (0.5 rung, below threshold), and ~ambiguous_frac tech entries
    that ALSO get a non-tech twin at a higher id (multi-sense collisions
    for the context re-ranker). Fully deterministic in (n, seed)."""
    rng = random.Random(seed)
    curated_keys = {lbl for _, lbl, _, _ in KB_ENTRIES} | {
        a for _, _, _, al in KB_ENTRIES for a in al
    }
    rows: list[tuple[str, str, str, list[str]]] = list(
        (k, lbl, d, list(a)) for k, lbl, d, a in KB_ENTRIES
    )
    twins: list[tuple[str, str]] = []
    used: set[str] = set(curated_keys)
    i_name = 0
    n_primary = 0
    while n_primary < n:
        label = _fused(i_name)
        i_name += 1
        if label in used:
            continue
        used.add(label)
        kb_id = f"kbx:1{n_primary:05d}"
        roll = rng.random()
        aliases = []
        if rng.random() < 0.6:
            # prefer the acronym; most 2-letter acronyms collide at this
            # scale, so fall back to the vowel-stripped compact form —
            # both are how real aliases look (k8s, pg, strmbs)
            strip = "".join(ch for ch in label
                            if ch not in "aeiou ")
            for ac in (_acronym(label), strip):
                if len(ac) >= 2 and ac not in used:
                    aliases.append(ac)
                    used.add(ac)
                    break
        if roll < nontech_frac:
            desc = (f"{rng.choice(_NONTECH_ADJ)} {rng.choice(_NONTECH_NOUN)} "
                    f"from regional folklore")
        else:
            desc = (f"{rng.choice(_TECH_ADJ)} {rng.choice(TECH_KEYWORDS)} "
                    f"for {rng.choice(_TECH_DOMAIN)} workloads")
            if roll < nontech_frac + ambiguous_frac:
                twins.append((label, f"{rng.choice(_NONTECH_ADJ)} "
                                     f"{rng.choice(_NONTECH_NOUN)} "
                                     f"of {rng.choice(_NONTECH_NOUN)} lore"))
        rows.append((kb_id, label, desc, aliases))
        n_primary += 1
    # twins: the non-tech sense of an ambiguous label, id ABOVE every
    # primary id so the context-free tie-break keeps the tech sense
    for t, (label, desc) in enumerate(twins):
        rows.append((f"kbx:9{t:05d}", label, desc, []))
    # the 0.5-rung substring contract (non-tech descriptions must not
    # contain any TECH_KEYWORD) is enforced once at import time by
    # _validate_nontech_vocab(), which covers every composition these
    # templates can produce — no per-row rescan needed
    return rows


def write_kb(spark, path: str, n: int = 30000, seed: int = 7) -> int:
    """Write the curated+generated dimension as a kb_df(path=...)-loadable
    parquet table; returns the row count."""
    from session_graph_spark.operators.linking import KB_SCHEMA

    rows = generate_kb_rows(n=n, seed=seed)
    spark.createDataFrame(rows, KB_SCHEMA).coalesce(1) \
        .write.mode("overwrite").parquet(path)
    return len(rows)
