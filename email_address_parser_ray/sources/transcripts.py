"""Deterministic synthetic transcript corpus (the engine's primary input).

BASELINE.json ``input_hint`` prescribes the input shape::

    transcripts(conv_id: string, turn_idx: int32, role: string,
                text: string, tool: string, ts: timestamp[us])

No driver-provided table has this shape, so we synthesise it
deterministically (fixed seed, scaled by ``sf``) — FIXTURES.md §1.  The
generator also emits the ground truth needed by the correctness gates:

* ``gold_mentions``  — one row per planted address occurrence
  (conv_id, turn_idx, mention_idx, address, local, domain, entity_id,
  style); the extraction oracle.
* ``gold_entities``  — one row per (entity_id, address surface form);
  the clustering oracle (pairwise F1 + resolve_clusters query).

Entity population & perturbations (FIXTURES.md §1 synthesis rules):

* ~``16000*sf`` "person" entities, ``first.last@domain`` base addresses;
  domains Zipf-skewed with one hot domain (>20% of rows) to exercise
  skew-aware blocking/salting.
* per-entity surface variants that a canonicalizer+fuzzy scorer must
  re-unify: domain case changes, dot-removal in the local part, a
  single-character digit typo, single-WSP wrapping (strict-valid per the
  reference's ``dot_atom = WSP? ... WSP?`` — nom_parser.rs:91-102), and
  a quoted-string form of the local part.
* a rotation of the reference conformance-corpus positives
  (/root/reference/.test_data/valid_*.txt cartesian) planted verbatim in
  angle brackets, as singleton "exotic" entities — these exercise the
  full RFC 5322/6532 grammar inside free text.

Determinism: everything derives from ``numpy.random.RandomState(SEED)``
streams keyed by (sf, table); regeneration is byte-stable, so cached
Parquet under /tmp can be trusted across processes (atomic rename
publish).  Plain pyarrow/numpy — no Ray needed to generate.
"""

from __future__ import annotations

import os
import shutil
from typing import Dict, List, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 20260817
GEN_VERSION = 6  # bump to invalidate /tmp caches when synthesis rules change
CACHE_ROOT = "/tmp/eap_ray_cache"
TURNS_PER_SF = 5_000_000  # sf0.001 -> 5k turns, sf0.01 -> 50k, sf0.1 -> 500k
ENTITIES_PER_SF = 16_000
ROWS_PER_FILE = 131_072  # multiple files => parallel read + resumable layout

_FIRST = [
    "alice", "benjamin", "carolina", "dmitri", "eleanor", "farid", "gabriela",
    "hiroshi", "ingrid", "jamal", "katarina", "leopold", "margarethe", "nikolai",
    "ophelia", "priyanka", "quentin", "rosalind", "sebastian", "tatiana",
    "umberto", "valentina", "wilhelm", "xiomara", "yevgeni", "zuleika",
    "augustin", "beatrix", "cornelius", "delphine", "emmanuel", "fredrika",
    "giancarlo", "henrietta", "ignatius", "josephine", "kristoffer", "lavinia",
    "maximilian", "nathaniel",
]
_LAST = [
    "abernathy", "blackwood", "castellanos", "davenport", "eastwick",
    "fitzgerald", "greenfield", "hawthorne", "ivanovich", "jamieson",
    "kowalczyk", "lindqvist", "montgomery", "novikova", "ostrowski",
    "pemberton", "quintero", "rasmussen", "silverstein", "thornberry",
    "underwood", "vanderbilt", "wakefield", "xanthopoulos", "yamaguchi",
    "zimmermann", "ashworth", "bergstrom", "calloway", "dimitriou",
    "ellsworth", "fairbanks", "featherstone", "brightwater", "ironside", "jorgensen",
    "kettleburn", "silvermane", "marchetti", "northcott", "okonkwo",
    "petrakis", "quillfeather", "rothschild", "sinclair", "thackeray",
    "ulfsdottir", "villanueva", "westergaard", "yarborough",
]
# Zipf-skewed domain pool; index 0 is the deliberately hot domain (>20%).
_DOMAINS = [
    "hotmail-relay.example.com", "corp-mail.example.org", "uni-lab.example.edu",
    "research.example.net", "startup.example.io", "agency.example.co",
    "institute.example.org", "collective.example.net", "workshop.example.com",
    "foundry.example.io", "observatory.example.edu", "syndicate.example.co",
    "archive.example.org", "laboratory.example.net", "consortium.example.com",
    "atelier.example.io", "registry.example.edu", "bureau.example.co",
    "exchange.example.org", "terminal.example.net",
]
_ROLES = ["user", "assistant", "system", "tool"]
_TOOLS = ["", "search", "calendar", "mailer", "crm_lookup", "directory"]

_LEADS = [
    "Sure, I looped in", "Forwarding this to", "The ticket was filed by",
    "Please cc", "According to the directory, reach", "Escalating: contact",
    "Resolved after messaging", "The owner on record is", "Try pinging",
    "No response yet from", "Confirmed the handoff with", "Routing approval via",
]
_TAILS = [
    "before the standup tomorrow.", "and close the loop by Friday.",
    "for the quarterly review.", "regarding the failed deployment.",
    "about the contract renewal.", "so we can unblock the migration.",
    "once the audit completes.", "per the on-call rotation.",
    "to verify the invoice.", "ahead of the incident retro.",
]
_PLAIN_PROSE = [
    "Summarizing the sprint: migrations are green and the backlog is trimmed.",
    "The build passed on the third retry; flaky test quarantined for now.",
    "Budget numbers look stable this quarter, no variance above threshold.",
    "Rescheduled the design review to avoid the holiday overlap.",
    "Deployment window confirmed; rollback plan documented in the runbook.",
    "Latency regressions traced to the cache eviction policy change.",
    "Customer escalation closed after the hotfix shipped to all regions.",
    "Notes archived; action items assigned during the retro session.",
]

# variant style codes recorded in gold tables
STYLE_BASE = "base"
STYLE_CASE = "domain_case"
STYLE_DOTLESS = "dotless"
STYLE_TYPO = "typo"
STYLE_WSP = "wsp"
STYLE_QUOTED = "quoted"
STYLE_EXOTIC = "exotic"


def _case_variant(domain: str, rng: np.random.RandomState) -> str:
    chars = list(domain)
    idx = [i for i, c in enumerate(chars) if c.isalpha()]
    k = max(1, len(idx) // 3)
    for i in rng.choice(idx, size=min(k, len(idx)), replace=False):
        chars[i] = chars[i].upper()
    return "".join(chars)


def _typo_variant(local: str, rng: np.random.RandomState) -> str:
    # substitute ONE alphabetic char (position >=1) with a digit: keeps the
    # typo'd form >=1 edit from every other entity's clean local (clean
    # locals are letter+dot only), so a lev<=1 accept rule stays precise.
    idx = [i for i, c in enumerate(local) if c.isalpha() and i >= 1]
    i = int(rng.choice(idx))
    return local[:i] + str(rng.randint(10)) + local[i + 1 :]


def build_entities(sf: float) -> List[dict]:
    """Deterministic entity population with per-entity surface variants."""
    rng = np.random.RandomState(SEED + 1)
    n = max(32, int(ENTITIES_PER_SF * sf))
    # base pool 40×50 names; a triple-letter suffix multiplies it 27×.
    # The suffix keeps every pair of distinct clean locals at edit
    # distance >= 2 (suffixes differ in 3 positions; name combos differ in
    # >= 2), and typo variants substitute DIGITS (absent from clean
    # locals), so no lev<=1 accept rule can merge two distinct entities.
    suffixes = [""] + [chr(ord("a") + i) * 3 for i in range(26)]
    pairs = [(f, l + s) for s in suffixes for f in _FIRST for l in _LAST]
    order = rng.permutation(len(pairs))[:n]
    # Zipf-ish domain assignment; domain 0 is hot.
    dom_w = 1.0 / np.arange(1, len(_DOMAINS) + 1) ** 1.1
    dom_w[0] *= 3.0
    dom_w /= dom_w.sum()
    entities = []
    for eid, pi in enumerate(order):
        f, l = pairs[pi]
        local = f"{f}.{l}"
        domain = _DOMAINS[int(rng.choice(len(_DOMAINS), p=dom_w))]
        base = f"{local}@{domain}"
        variants: List[Tuple[str, str]] = [(STYLE_BASE, base)]
        variants.append((STYLE_CASE, f"{local}@{_case_variant(domain, rng)}"))
        variants.append((STYLE_DOTLESS, f"{local.replace('.', '')}@{domain}"))
        variants.append((STYLE_TYPO, f"{_typo_variant(local, rng)}@{domain}"))
        variants.append((STYLE_WSP, f" {base}"))  # strict-valid: dot_atom = WSP? ... (nom_parser.rs:91-102)
        variants.append((STYLE_QUOTED, f'"{local}"@{domain}'))
        entities.append(
            {"entity_id": eid, "local": local, "domain": domain, "variants": variants}
        )
    return entities


def _exotic_addresses() -> List[Tuple[str, str, str, int]]:
    """(address, local, domain, entity_id) positives from the reference
    conformance corpus (same cartesian as rust-lib/build.rs:87-126),
    planted verbatim in <...>.

    Entity ids group corpus addresses by *canonical key* (comments/CFWS
    stripped, quoted-strings unquoted, domain case-folded): distinct
    surface spellings of the same canonical address are the same
    identity — e.g. ``"test"@iana.org`` and ``test@iana.org``."""
    from ..functions.corpus import load_corpus
    from ..functions.grammar import parse_address

    corpus = load_corpus()
    raw = []
    for lp in corpus.valid_local_parts:
        for d in corpus.valid_domains:
            addr = f"{lp}@{d}"
            if "<" in addr or ">" in addr:
                continue
            p = parse_address(addr, is_lax=True)
            raw.append((addr, lp, d, p.canonical_key if p else addr))
    canon_ids = {k: i for i, k in enumerate(sorted({r[3] for r in raw}))}
    return [
        (addr, lp, d, 1_000_000 + canon_ids[ck]) for addr, lp, d, ck in raw
    ]


def _cat(rng: np.random.RandomState, p: np.ndarray, size: int) -> np.ndarray:
    """Vectorized categorical draw via one cdf + searchsorted (rng.choice
    with ``p=`` rebuilds the cdf per call — quadratic at corpus scale)."""
    cdf = np.cumsum(np.asarray(p, dtype=np.float64))
    cdf[-1] = 1.0
    return np.searchsorted(cdf, rng.random_sample(size), side="right")


def synthesize_tables(sf: float) -> Dict[str, pa.Table]:
    rng = np.random.RandomState(SEED + 2)
    n_turns = max(500, int(TURNS_PER_SF * sf))
    entities = build_entities(sf)
    exotics = _exotic_addresses()
    n_ent = len(entities)

    # entity popularity: Zipf
    ent_w = 1.0 / np.arange(1, n_ent + 1) ** 0.9
    ent_w /= ent_w.sum()

    # conversation lengths ~ geometric-ish, 2..40 turns
    lens_draw = np.minimum(40, 2 + rng.geometric(0.18, size=n_turns))
    cum = np.cumsum(lens_draw)
    n_convs = int(np.searchsorted(cum, n_turns, side="left") + 1)
    conv_lens = lens_draw[:n_convs]
    total_turns = int(conv_lens.sum())

    # variant pick distribution (style index into entity["variants"])
    var_p = np.array([0.58, 0.10, 0.10, 0.10, 0.06, 0.06])

    # ALL randomness pre-drawn as vectorized streams (deterministic order)
    role_idx = _cat(rng, [0.42, 0.42, 0.06, 0.10], total_turns)
    tool_idx = rng.randint(len(_TOOLS), size=total_turns)
    k_arr = _cat(rng, [0.50, 0.38, 0.12], total_turns)
    prose_idx = rng.randint(len(_PLAIN_PROSE), size=total_turns)
    lead_idx = rng.randint(len(_LEADS), size=total_turns)
    tail_idx = rng.randint(len(_TAILS), size=total_turns)
    n_mentions_total = int(k_arr.sum())
    ent_draw = _cat(rng, ent_w, n_mentions_total)
    var_draw = _cat(rng, var_p, n_mentions_total)

    conv_ids: List[str] = []
    turn_idxs: List[int] = []
    roles: List[str] = []
    texts: List[str] = []
    tools: List[str] = []
    tss: List[int] = []

    m_conv: List[str] = []
    m_turn: List[int] = []
    m_idx: List[int] = []
    m_addr: List[str] = []
    m_local: List[str] = []
    m_domain: List[str] = []
    m_eid: List[int] = []
    m_style: List[str] = []

    base_ts = 1_700_000_000_000_000  # us
    exotic_cursor = 0
    n_mention_draws = 0
    gti = 0  # global turn index into the pre-drawn streams

    for ci in range(n_convs):
        ln = int(conv_lens[ci])
        conv_id = f"conv-{ci:08d}"
        conv_start = base_ts + ci * 3_600_000_000
        for ti in range(ln):
            role = _ROLES[role_idx[gti]]
            tool = _TOOLS[tool_idx[gti]] if role == "tool" else ""
            k = int(k_arr[gti])
            if k == 0:
                text = _PLAIN_PROSE[prose_idx[gti]]
            else:
                frags = [_LEADS[lead_idx[gti]]]
                for mi in range(k):
                    draw_i = n_mention_draws
                    n_mention_draws += 1
                    # every ~29th mention is an exotic corpus address in <...>
                    if n_mention_draws % 29 == 0 and exotics:
                        addr, lp, dom, eid = exotics[exotic_cursor % len(exotics)]
                        exotic_cursor += 1
                        frags.append(f"<{addr}>")
                        m_eid.append(eid)
                        m_style.append(STYLE_EXOTIC)
                        m_addr.append(addr)
                        m_local.append(lp)
                        m_domain.append(dom)
                    else:
                        eid = int(ent_draw[draw_i])
                        ent = entities[eid]
                        style, addr = ent["variants"][int(var_draw[draw_i])]
                        if style in (STYLE_WSP, STYLE_QUOTED):
                            frags.append(f"<{addr}>")
                        else:
                            frags.append(addr)
                        at = addr.rindex("@")
                        m_eid.append(eid)
                        m_style.append(style)
                        m_addr.append(addr)
                        m_local.append(addr[:at])
                        m_domain.append(addr[at + 1 :])
                    m_conv.append(conv_id)
                    m_turn.append(ti)
                    m_idx.append(mi)
                    if mi < k - 1:
                        frags.append("and")
                frags.append(_TAILS[tail_idx[gti]])
                text = " ".join(frags)
            conv_ids.append(conv_id)
            turn_idxs.append(ti)
            roles.append(role)
            texts.append(text)
            tools.append(tool)
            tss.append(conv_start + ti * 45_000_000)
            gti += 1

    transcripts = pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(turn_idxs, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array(tools, pa.string()),
            "ts": pa.array(tss, pa.timestamp("us")),
        }
    )
    gold_mentions = pa.table(
        {
            "conv_id": pa.array(m_conv, pa.string()),
            "turn_idx": pa.array(m_turn, pa.int32()),
            "mention_idx": pa.array(m_idx, pa.int32()),
            "address": pa.array(m_addr, pa.string()),
            "local_part": pa.array(m_local, pa.string()),
            "domain": pa.array(m_domain, pa.string()),
            "entity_id": pa.array(m_eid, pa.int64()),
            "style": pa.array(m_style, pa.string()),
        }
    )
    # gold_entities: one row per (entity_id, distinct surface address)
    ge_eid, ge_addr = [], []
    for ent in entities:
        seen = set()
        for _, addr in ent["variants"]:
            if addr not in seen:
                seen.add(addr)
                ge_eid.append(ent["entity_id"])
                ge_addr.append(addr)
    for addr, _, _, eid in _exotic_addresses():
        ge_eid.append(eid)
        ge_addr.append(addr)
    gold_entities = pa.table(
        {
            "entity_id": pa.array(ge_eid, pa.int64()),
            "address": pa.array(ge_addr, pa.string()),
        }
    )
    return {
        "transcripts": transcripts,
        "gold_mentions": gold_mentions,
        "gold_entities": gold_entities,
        "gold_nodes": _gold_nodes(sorted(set(ge_addr))),
    }


def _gold_nodes(addresses: List[str]) -> pa.Table:
    """Canonical node columns for every plantable surface — the SQL-side
    inputs for the ``match_edges`` oracle.  Derivations mirror the
    engine's blocking/scoring features exactly (dotless =
    local_canon minus dots, domain_key = casefolded domain_canon), so
    the oracle can restate the accept rules in plain SQL
    (levenshtein/string equality) without re-implementing the grammar."""
    from ..functions.grammar import parse_address

    dotless, domain_key, canon = [], [], []
    for addr in addresses:
        p = parse_address(addr, is_lax=True)
        if p is None:  # unreachable for gold surfaces; keep deterministic
            local, _, dom = addr.rpartition("@")
            dotless.append(local.replace(".", ""))
            domain_key.append(dom.lower())
            canon.append(addr)
            continue
        dotless.append(p.local_canon.replace(".", ""))
        domain_key.append(p.domain_canon.lower())
        canon.append(p.canonical_key)
    return pa.table(
        {
            "address": pa.array(addresses, pa.string()),
            "dotless": pa.array(dotless, pa.string()),
            "domain_key": pa.array(domain_key, pa.string()),
            "canonical_key": pa.array(canon, pa.string()),
        }
    )


def sf_from_dir(sf_dir: str) -> str:
    """'/root/testdata/sf0.01' -> '0.01' (also accepts bare '0.01')."""
    name = os.path.basename(os.path.normpath(sf_dir))
    return name[2:] if name.startswith("sf") else name


def cache_dir(sf_dir: str) -> str:
    return os.path.join(CACHE_ROOT, f"sf{sf_from_dir(sf_dir)}")


def ensure_transcripts(sf_dir: str) -> str:
    """Generate (once, atomically) the transcript corpus for this sf.

    Returns the cache directory containing ``transcripts/`` (sharded
    parquet), ``gold_mentions.parquet`` and ``gold_entities.parquet``.
    """
    out = cache_dir(sf_dir)
    marker = os.path.join(out, "_SUCCESS")
    stamp = f"seed={SEED} v={GEN_VERSION}"
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().startswith(stamp):
                return out
        shutil.rmtree(out, ignore_errors=True)  # stale generator version
    sf = float(sf_from_dir(sf_dir))
    tables = synthesize_tables(sf)
    tmp = out + f".tmp.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(os.path.join(tmp, "transcripts"), exist_ok=True)
    t = tables["transcripts"]
    for shard, off in enumerate(range(0, t.num_rows, ROWS_PER_FILE)):
        pq.write_table(
            t.slice(off, ROWS_PER_FILE),
            os.path.join(tmp, "transcripts", f"part-{shard:05d}.parquet"),
        )
    pq.write_table(tables["gold_mentions"], os.path.join(tmp, "gold_mentions.parquet"))
    pq.write_table(tables["gold_entities"], os.path.join(tmp, "gold_entities.parquet"))
    pq.write_table(tables["gold_nodes"], os.path.join(tmp, "gold_nodes.parquet"))
    with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
        f.write(f"seed={SEED} v={GEN_VERSION} sf={sf} rows={t.num_rows}\n")
    os.makedirs(CACHE_ROOT, exist_ok=True)
    try:
        os.rename(tmp, out)
    except OSError:
        # lost a race with a concurrent generator — its output is identical
        shutil.rmtree(tmp, ignore_errors=True)
    return out
