"""Deterministic synthetic transcript corpus with planted duplicate clusters.

Produces the engine's primary input table in the exact BASELINE.json
``input_hint`` shape::

    transcripts(conv_id string, turn_idx int, role string, text string,
                tool string, ts timestamp)

plus the ground-truth tables the evaluation protocol needs (the analogue of
the reference's ``manual_candidates.json`` golden labels,
ref: src/match_utils.py:197-213):

    cluster_truth(conv_id string, entity_id string)
    labeled_pairs(left_id string, right_id string, label int)

Duplicate conversations are noise-perturbed copies of a base conversation:
LaTeX-ish wrappers, %-comments, unicode dashes, whitespace churn — all erased
by the canonical normalizer — plus (for "near" duplicates) a bounded number of
token-level edits.  Distractor conversations share topics (hence blocking
keys) without being duplicates.  Everything is seeded and wall-clock-free.
"""

from __future__ import annotations

import datetime as dt
import itertools
import random
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

TRANSCRIPT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), True),
        StructField("text", StringType(), True),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), True),
    ]
)

_TOPICS = [
    "entity resolution over citation graphs",
    "minhash signatures for near duplicate detection",
    "spark shuffle partitioning under skew",
    "arrow batches for vectorized python udfs",
    "iceberg snapshot isolation and time travel",
    "logistic regression match scoring",
    "transitive closure with connected components",
    "window ordered document assembly",
    "jaro winkler similarity on author names",
    "tfidf cosine candidate generation",
    "blocking keys from role tool signatures",
    "greedy one to one assignment",
]

_VERBS = ["compute", "compare", "assemble", "score", "cluster", "partition", "rank", "merge"]
_NOUNS = ["pairs", "tokens", "blocks", "documents", "signatures", "features", "labels", "clusters"]
# Wide tool vocabulary: each entity uses a fixed 2-subset, so cross-entity
# signature collisions (which would add rule-score boosts to negatives) are rare.
_TOOLS = [f"tool{i:02d}" for i in range(20)]

_EPOCH = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)


@dataclass
class SynthConfig:
    n_base: int = 120          # base conversations (entities)
    seed: int = 23120334       # reference's canonical seed (src/match_utils.py:526)
    max_cluster: int = 5       # duplicates per entity in 1..max_cluster
    near_dup_frac: float = 0.3 # fraction of copies that get token edits too
    min_turns: int = 4
    max_turns: int = 12


def _base_turns(rng: random.Random, topic: str, n_turns: int) -> list[tuple[str, str, str]]:
    """(role, text, tool) turns for one base conversation.

    Each entity carries strong identity signals that survive normalization:
    a unique session token repeated in every turn (high TF-IDF weight), a
    fixed 2-tool subset, and a fixed year — so planted duplicates separate
    cleanly from same-topic distractors at the match threshold (SURVEY §7.5:
    the F1 target verifies plumbing, not model luck).
    """
    session = f"session{rng.getrandbits(40):010x}"
    jargon_pool = [f"xq{rng.getrandbits(24):06x}" for _ in range(6)]
    tools = rng.sample(_TOOLS, 2)
    year = rng.randint(1900, 2099)
    phrasing = rng.randrange(3)  # per-entity template variant
    turns: list[tuple[str, str, str]] = []
    for t in range(n_turns):
        role = ("user", "assistant", "tool")[t % 3]
        verb, noun = rng.choice(_VERBS), rng.choice(_NOUNS)
        jargon = " ".join(rng.sample(jargon_pool, 3))
        nonce = f"nx{rng.getrandbits(32):08x}"  # unique per (entity, turn)
        if role == "tool":
            tool = tools[t % 2]
            text = (
                f"{tool} result for {session} item {nonce}: {verb} {noun} on"
                f" {jargon} about {topic} returned {rng.randint(1, 99)} rows in {year}"
            )
        else:
            tool = ""
            if phrasing == 0:
                text = (
                    f"{role} turn {t} of {session}: please {verb} the {noun}"
                    f" covering {jargon} about {topic} circa {year} see {nonce}"
                )
            elif phrasing == 1:
                text = (
                    f"{role} message {t} in {session} regarding {nonce}:"
                    f" {verb} {noun} for {jargon} on {topic} around {year}"
                )
            else:
                text = (
                    f"{session} {role} step {t}: {noun} {verb} task {nonce}"
                    f" with {jargon} re {topic} dated {year}"
                )
        turns.append((role, text, tool))
    return turns


def _perturb_text(rng: random.Random, text: str, near: bool) -> str:
    """Surface noise the normalizer must erase; ``near`` adds token edits."""
    words = text.split()
    if near and len(words) > 4:
        # bounded token-level edits: swap two adjacent words, drop one filler
        i = rng.randrange(len(words) - 1)
        words[i], words[i + 1] = words[i + 1], words[i]
        if rng.random() < 0.5:
            j = rng.randrange(len(words))
            words.insert(j, rng.choice(["indeed", "notably", "also"]))
    out: list[str] = []
    for w in words:
        r = rng.random()
        if r < 0.08:
            out.append("\\textbf{%s}" % w)
        elif r < 0.12:
            out.append("\\emph{%s}" % w)
        elif r < 0.15:
            out.append(w + ",")
        else:
            out.append(w)
    s = " ".join(out)
    if rng.random() < 0.3:
        s += " % trailing comment " + str(rng.randint(0, 9))
    if rng.random() < 0.2:
        s = s.replace(" ", "  ", 1)
    if rng.random() < 0.2:
        s = s.replace("-", "–") if "-" in s else s + " — ok"
    return s


def entity_rows(cfg: SynthConfig, b: int) -> tuple[list[tuple], list[tuple[str, str]]]:
    """All transcript rows + memberships for ONE base entity.

    Seeded per entity — rng = Random(seed XOR shifted entity index) — so
    generation is embarrassingly parallel AND bit-identical whether it runs on
    the driver or sharded across executors (SURVEY §7.4.4: order-free
    determinism; a single global Random would make output depend on iteration
    order)."""
    rng = random.Random((cfg.seed << 20) ^ b)
    entity_id = f"e{b:05d}"
    topic = _TOPICS[b % len(_TOPICS)]
    n_turns = rng.randint(cfg.min_turns, cfg.max_turns)
    base = _base_turns(rng, topic, n_turns)
    n_copies = rng.randint(1, cfg.max_cluster)
    rows: list[tuple] = []
    membership: list[tuple[str, str]] = []
    for k in range(n_copies):
        conv_id = f"c{b:05d}x{k}"
        membership.append((conv_id, entity_id))
        near = k > 0 and rng.random() < cfg.near_dup_frac
        for t, (role, text, tool) in enumerate(base):
            txt = text if k == 0 else _perturb_text(rng, text, near)
            ts = _EPOCH + dt.timedelta(days=b % 3650, minutes=5 * t + k)
            rows.append((conv_id, t, role, txt, tool, ts))
    return rows, membership


def generate_rows(cfg: SynthConfig) -> tuple[list[tuple], list[tuple[str, str]]]:
    """Return (transcript_rows, [(conv_id, entity_id)]) deterministically."""
    rows: list[tuple] = []
    membership: list[tuple[str, str]] = []
    for b in range(cfg.n_base):
        r, m = entity_rows(cfg, b)
        rows.extend(r)
        membership.extend(m)
    return rows, membership


def transcripts_df_distributed(spark: SparkSession, cfg: SynthConfig) -> DataFrame:
    """Executor-side generation: spark.range over entity ids -> mapInPandas.

    Bit-identical to :func:`transcripts_df` (per-entity seeding) but scales to
    corpora far beyond driver memory — this is what bench/scaling runs use.
    """
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            out_rows = []
            for b in pdf["id"]:
                rows, _ = entity_rows(cfg, int(b))
                out_rows.extend(rows)
            yield pd.DataFrame(
                out_rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
            )

    n_shards = max(32, cfg.n_base // 64)
    return (
        spark.range(0, cfg.n_base, numPartitions=min(n_shards, cfg.n_base))
        .mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)
    )


def transcripts_df(spark: SparkSession, cfg: SynthConfig | None = None) -> DataFrame:
    cfg = cfg or SynthConfig()
    rows, _ = generate_rows(cfg)
    return spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)


def cluster_truth_df(spark: SparkSession, cfg: SynthConfig | None = None) -> DataFrame:
    cfg = cfg or SynthConfig()
    _, membership = generate_rows(cfg)
    return spark.createDataFrame(membership, "conv_id string, entity_id string")


def labeled_pairs_df(spark: SparkSession, cfg: SynthConfig | None = None) -> DataFrame:
    """All labeled pairs within each entity (label 1) plus same-topic
    cross-entity distractor pairs (label 0), canonical left_id < right_id."""
    cfg = cfg or SynthConfig()
    _, membership = generate_rows(cfg)
    by_entity: dict[str, list[str]] = {}
    for conv_id, entity_id in membership:
        by_entity.setdefault(entity_id, []).append(conv_id)
    pairs: list[tuple[str, str, int]] = []
    for convs in by_entity.values():
        for a, b in itertools.combinations(sorted(convs), 2):
            pairs.append((a, b, 1))
    # distractors: entities sharing a topic (b % len(_TOPICS) equal) are in the
    # same block neighborhood; first conv of consecutive same-topic entities
    ents = sorted(by_entity)
    for i in range(len(ents) - len(_TOPICS)):
        a = sorted(by_entity[ents[i]])[0]
        b = sorted(by_entity[ents[i + len(_TOPICS)]])[0]
        lo, hi = min(a, b), max(a, b)
        pairs.append((lo, hi, 0))
    return spark.createDataFrame(pairs, "left_id string, right_id string, label int")
