"""Seeded randomized parity stress for the round-5 text-surgery operators:
dozens of small random corpora (tiny alphabet → dense gram collisions,
heavy span merging, constant hash tie-breaks) compared case-by-case
against independent pure-Python mirrors of the specs — the same seeded
parity-stress pattern the wave-selection paths use."""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import functions as F

from arxiv_crawler_spark.operators import dedup as DD
from arxiv_crawler_spark.operators.sampling import select_token_budget

ALPHABET = ["a", "b", "c", "d"]


def _rand_corpora(seed: int, n_cases: int = 40):
    """[(case_id, [(doc_id, text), ...]), ...] — tiny-alphabet random docs
    (0-20 tokens) so duplicated grams, within-doc repeats, and adjacent
    windows occur constantly."""
    rng = random.Random(seed)
    out = []
    for c in range(n_cases):
        docs = [
            (d, " ".join(rng.choice(ALPHABET) for _ in range(rng.randrange(0, 21))))
            for d in range(rng.randrange(1, 7))
        ]
        out.append((c, docs))
    return out


def _batched_df(spark, corpora):
    rows = [(c, d, t) for c, docs in corpora for d, t in docs]
    return spark.createDataFrame(rows, ["case_id", "doc_id", "text"])


def _toks(t: str) -> list[str]:
    return [x for x in t.split(" ") if x]


def _py_spans(docs, n, min_count):
    """Pure-Python ExactSubstr spec: corpus-wide gram counts → covered
    gram starts → merge windows that overlap or tile adjacently."""
    from collections import Counter

    cnt = Counter()
    for _, t in docs:
        toks = _toks(t)
        for i in range(len(toks) - n + 1):
            cnt[tuple(toks[i : i + n])] += 1
    spans = {}
    for d, t in docs:
        toks = _toks(t)
        starts = [
            i + 1
            for i in range(len(toks) - n + 1)
            if cnt[tuple(toks[i : i + n])] >= min_count
        ]
        merged = []
        for p in starts:
            s, e = p, p + n - 1
            if merged and s <= merged[-1][1] + 1:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        for s, e in merged:
            spans[(d, s)] = (e, e - s + 1)
    return spans


def test_duplicate_and_removed_spans_match_python_spec(spark):
    # gram counting is corpus-wide, so each random corpus runs as its own
    # small job (batching would merge the corpora's gram counts)
    corpora = _rand_corpora(seed=421, n_cases=14)
    df = _batched_df(spark, corpora)
    n, mc = 3, 2

    for c, docs in corpora:
        want = _py_spans(docs, n, mc)
        sub = df.filter(F.col("case_id") == c).select("doc_id", "text")
        got = {
            (r["doc_id"], r["span_start"]): (r["span_end"], r["span_tokens"])
            for r in DD.duplicate_spans(sub, n=n, min_count=mc).collect()
        }
        assert got == want, (c, got, want)

        cut = {
            r["doc_id"]: (r["text"], r["n_removed"])
            for r in DD.remove_duplicate_spans(sub, n=n, min_count=mc).collect()
        }
        for d, t in docs:
            toks = _toks(t)
            covered = set()
            for (dd, s), (e, _) in want.items():
                if dd == d:
                    covered.update(range(s, e + 1))
            kept = [tok for i, tok in enumerate(toks, 1) if i not in covered]
            exp_text = t if not covered else " ".join(kept)
            assert cut[d] == (exp_text, len(covered)), (c, d)


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_winnow_matches_python_spec(spark):
    corpora = _rand_corpora(seed=422, n_cases=12)
    n, w = 3, 3
    md5_col = lambda col: F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")  # noqa: E731
    for c, docs in corpora:
        sub = _batched_df(spark, [(c, docs)]).select("doc_id", "text")
        got = {
            (r["doc_id"], r["pos"], r["gram_hash"])
            for r in DD.winnow_fingerprints(sub, n=n, w=w, hash_fn=md5_col).collect()
        }
        want = set()
        for d, t in docs:
            toks = _toks(t)
            grams = [
                (i + 1, _md5_60(" ".join(toks[i : i + n])))
                for i in range(len(toks) - n + 1)
            ]
            for e in range(w - 1, len(grams)):
                win = grams[e - w + 1 : e + 1]
                m = min(h for _, h in win)
                pos = max(p for p, h in win if h == m)
                want.add((d, pos, m))
        assert got == want, c


def test_token_budget_matches_python_rule_randomized(spark):
    rng = random.Random(423)
    for trial in range(6):
        docs = [
            (d, " ".join(rng.choice(ALPHABET + ["the", "of", "and"]) for _ in range(rng.randrange(1, 40))))
            for d in range(rng.randrange(3, 25))
        ]
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        total = sum(len(_toks(t)) for _, t in docs)
        budget = rng.randrange(0, total + 5)
        nbins = rng.choice([1, 3, 50, 1000])
        got = {
            r["doc_id"]: r["n_tokens"]
            for r in select_token_budget(df, budget, nbins=nbins).collect()
        }
        # python mirror of the selection rule using the ENGINE's own scores
        # (the everything-fits path returns every doc scored)
        base = {
            r["doc_id"]: (r["score"], r["n_tokens"])
            for r in select_token_budget(df, 10**9).collect()
        }
        order = sorted(base.items(), key=lambda kv: (-kv[1][0], kv[0]))
        want, cum = {}, 0
        for d, (s, t) in order:
            cum += t
            if cum > budget:
                break
            want[d] = t
        assert got == want, (trial, budget, nbins)


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_sketches_match_pure_python_mirrors(spark):
    """HLL registers and CMS cells, case-by-case against independent
    pure-Python mirrors of the md5-60 bridge spec — bit parity of the
    sketch contents themselves (register split, rho from the 52-bit
    tail, cell hashing), not just the estimates."""
    from arxiv_crawler_spark.operators.sketches import cms_build, hll_registers

    rng = random.Random(20260818)
    for case in range(12):
        items = [
            "w%d" % rng.randrange(1, 200) for _ in range(rng.randrange(1, 120))
        ]
        df = spark.createDataFrame([(v,) for v in items], "v string")

        regs_py: dict[int, int] = {}
        for v in set(items):
            h = _md5_60(v)
            tail = h & ((1 << 52) - 1)
            rho = 53 if tail == 0 else 53 - tail.bit_length()
            reg = h >> 52
            regs_py[reg] = max(regs_py.get(reg, 0), rho)
        got_regs = {
            r["reg"]: r["mj"] for r in hll_registers(df, "v", p=8).collect()
        }
        assert got_regs == regs_py, f"HLL case {case}"

        cells_py: dict[tuple[int, int], int] = {}
        for v in items:
            for r in range(4):
                key = (r, _md5_60(f"{v}#cms{r}") % 64)
                cells_py[key] = cells_py.get(key, 0) + 1
        got_cells = {
            (r["r"], r["bucket"]): r["cnt"]
            for r in cms_build(df, "v", d=4, w=64).collect()
        }
        assert got_cells == cells_py, f"CMS case {case}"
