"""Deterministic synthetic-data generators.

Two generators, both seeded with ``numpy.random.Generator(PCG64(seed))``
(FIXTURES.md is the spec; everything is reproducible bit-for-bit):

* ``generate_transcripts`` — the primary input table
  ``(conv_id, turn_idx, role, text, tool, ts)`` plus a ground-truth
  duplicate map.  Near-duplicate variants are produced by the same
  distortion family as the reference's generator
  (``utils/data_generator.py:139-170,306-320``: double-char,
  change-char, swap-char — swap never touches the first character and
  preserves length) plus transcript-level structural noise (turn drop /
  adjacent-turn swap) and an optional shared boilerplate system turn to
  create LSH hot bands for skew tests.  Variant ids are
  ``{orig}_v{k}``, mirroring the reference's ``id + "_v"`` convention
  (``data_generator.py:445``).

* ``generate_person_records`` — the reference-parity fixture: flat
  original/variant record pairs shaped like the reference generator's
  output (``data_generator.py:376-473``), used to validate the weighted
  scoring + greedy matching oracle.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# Mixed en/ru vocabulary so canonicalization + language detection are
# exercised; plain ASCII-safe words plus a Cyrillic tail.
_VOCAB_EN = (
    "the of a to and in data query user agent tool run step result value table "
    "file model batch stream sort merge join filter group key hash index node "
    "cluster shard block text turn message reply plan code test error retry fix "
    "read write scan load store cache spill limit order count match score"
).split()
_VOCAB_RU = (
    "данные запрос пользователь агент инструмент шаг результат значение таблица "
    "файл модель поток ключ узел кластер блок текст сообщение ответ план код "
    "тест ошибка чтение запись загрузка кэш порядок счёт совпадение оценка"
).split()
_VOCAB = _VOCAB_EN + _VOCAB_RU

_ROLES = ("user", "assistant", "system", "tool")
_TOOLS = ("search", "bash", "python", "browser", "editor", "")

_BOILERPLATE = (
    "You are a helpful assistant. Follow the instructions carefully, use the "
    "available tools when needed, and answer concisely. Always verify your "
    "results before responding to the user."
)

_EPOCH_US = 1_700_000_000_000_000  # fixed base timestamp (2023-11-14), µs


@dataclass(frozen=True)
class TranscriptGenConfig:
    n_convs: int = 200
    seed: int = 42
    mean_turns: float = 8.0
    dup_fraction: float = 0.3
    max_variants: int = 2
    # character-level distortion probabilities (per turn), reference knobs
    double_char_probability: float = 0.08
    change_char_probability: float = 0.10
    swap_char_probability: float = 0.08
    # structural distortion probabilities (per turn)
    turn_drop_probability: float = 0.05
    turn_swap_probability: float = 0.05
    # share of conversations that start with the shared boilerplate turn
    boilerplate_probability: float = 0.25
    min_words: int = 4
    max_words: int = 40


def _rng(seed: int) -> np.random.Generator:
    return np.random.Generator(np.random.PCG64(seed))


def _make_turn_texts(rng: np.random.Generator, n_turns: int, cfg: TranscriptGenConfig) -> list[str]:
    words_per_turn = rng.integers(cfg.min_words, cfg.max_words + 1, size=n_turns)
    total = int(words_per_turn.sum())
    idx = rng.integers(0, len(_VOCAB), size=total)
    texts = []
    pos = 0
    for w in words_per_turn:
        texts.append(" ".join(_VOCAB[i] for i in idx[pos : pos + w]))
        pos += int(w)
    return texts


def _double_char(rng: np.random.Generator, s: str) -> str:
    if len(s) < 1:
        return s
    i = int(rng.integers(0, len(s)))
    return s[: i + 1] + s[i] + s[i + 1 :]


def _change_char(rng: np.random.Generator, s: str) -> str:
    # never the first character, like the reference (data_generator.py:151-170)
    if len(s) < 2:
        return s
    i = int(rng.integers(1, len(s)))
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    c = alphabet[int(rng.integers(0, len(alphabet)))]
    return s[:i] + c + s[i + 1 :]


def _swap_chars(rng: np.random.Generator, s: str) -> str:
    # swap i with i+1 or i+2, never involving the first character and
    # preserving length (reference invariants, data_generator.py:306-320
    # / tests/test_error_handling.py:76-100)
    if len(s) < 3:
        return s
    i = int(rng.integers(1, len(s) - 1))
    j = min(i + int(rng.integers(1, 3)), len(s) - 1)
    if i == j:
        return s
    lst = list(s)
    lst[i], lst[j] = lst[j], lst[i]
    return "".join(lst)


def _distort_text(rng: np.random.Generator, s: str, cfg: TranscriptGenConfig) -> tuple[str, int]:
    ops = 0
    if rng.random() < cfg.double_char_probability:
        s = _double_char(rng, s)
        ops += 1
    if rng.random() < cfg.change_char_probability:
        s = _change_char(rng, s)
        ops += 1
    if rng.random() < cfg.swap_char_probability:
        s = _swap_chars(rng, s)
        ops += 1
    return s, ops


def generate_transcripts(cfg: TranscriptGenConfig) -> tuple[pa.Table, pa.Table]:
    """Build the transcripts table and the ground-truth dup map.

    Returns ``(transcripts, dup_truth)`` as Arrow tables with schemas
    per FIXTURES.md F1/F2.
    """
    rng = _rng(cfg.seed)

    conv_ids: list[str] = []
    turn_idxs: list[int] = []
    roles: list[str] = []
    texts: list[str] = []
    tools: list[str] = []
    tss: list[int] = []

    truth_orig: list[str] = []
    truth_dup: list[str] = []
    truth_level: list[float] = []

    # base conversations
    originals: list[tuple[str, list[tuple[str, str, str]]]] = []
    n_turns_arr = 1 + rng.geometric(1.0 / cfg.mean_turns, size=cfg.n_convs)
    for c in range(cfg.n_convs):
        cid = f"conv_{c:06d}"
        n_turns = int(n_turns_arr[c])
        turns: list[tuple[str, str, str]] = []  # (role, text, tool)
        body = _make_turn_texts(rng, n_turns, cfg)
        if rng.random() < cfg.boilerplate_probability:
            turns.append(("system", _BOILERPLATE, ""))
        for t in range(n_turns):
            if rng.random() < 0.15:
                role = "tool"
                tool = _TOOLS[int(rng.integers(0, len(_TOOLS) - 1))]
            else:
                role = "user" if (t % 2 == 0) else "assistant"
                tool = ""
            turns.append((role, body[t], tool))
        originals.append((cid, turns))

    # near-duplicate variants
    variants: list[tuple[str, list[tuple[str, str, str]]]] = []
    n_dups = int(cfg.n_convs * cfg.dup_fraction)
    dup_targets = rng.choice(cfg.n_convs, size=n_dups, replace=False)
    for target in dup_targets:
        cid, turns = originals[int(target)]
        k = 1 + int(rng.integers(0, cfg.max_variants))
        for v in range(1, k + 1):
            new_turns: list[tuple[str, str, str]] = []
            ops_total = 0
            chances = 0
            i = 0
            while i < len(turns):
                if len(turns) > 2 and rng.random() < cfg.turn_drop_probability:
                    i += 1
                    ops_total += 1
                    continue
                if i + 1 < len(turns) and rng.random() < cfg.turn_swap_probability:
                    a, b = turns[i + 1], turns[i]
                    ta, na = _distort_text(rng, a[1], cfg)
                    tb, nb = _distort_text(rng, b[1], cfg)
                    new_turns.append((a[0], ta, a[2]))
                    new_turns.append((b[0], tb, b[2]))
                    ops_total += 1 + na + nb
                    chances += 2
                    i += 2
                    continue
                role, text, tool = turns[i]
                text, n = _distort_text(rng, text, cfg)
                ops_total += n
                chances += 1
                new_turns.append((role, text, tool))
                i += 1
            vid = f"{cid}_v{v}"
            variants.append((vid, new_turns))
            truth_orig.append(cid)
            truth_dup.append(vid)
            truth_level.append(ops_total / max(1, chances))

    # flatten to the turn table
    for cid, turns in originals + variants:
        base_ts = _EPOCH_US + (hash64_stable(cid) % 10_000_000) * 1_000_000
        for idx, (role, text, tool) in enumerate(turns):
            conv_ids.append(cid)
            turn_idxs.append(idx)
            roles.append(role)
            texts.append(text)
            tools.append(tool)
            tss.append(base_ts + idx * 30_000_000)

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
    dup_truth = pa.table(
        {
            "orig_conv_id": pa.array(truth_orig, pa.string()),
            "dup_conv_id": pa.array(truth_dup, pa.string()),
            "distortion_level": pa.array(truth_level, pa.float64()),
        }
    )
    return transcripts, dup_truth


def hash64_stable(s: str) -> int:
    """Process-stable string hash for ts jitter (not security)."""
    import hashlib

    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "little")


def write_transcripts(
    out_dir: str, cfg: TranscriptGenConfig, shards: int | None = None
) -> str:
    """Write transcripts + dup_truth Parquet under ``out_dir`` (sharded
    by conv-id hash so readers get parallelism); idempotent — returns
    immediately if the marker file for this config already exists.

    Shard count defaults to ~1 file per 1500 conversations (min 4,
    max 64): every conversation's turns live in exactly ONE file
    (hash-sharded), which is both the resumable 100-TB layout and the
    precondition of the shuffle-free assembly fast path
    (``stages/assemble.py`` ``prepartitioned=True``)."""
    if shards is None:
        shards = max(4, min(64, cfg.n_convs // 1500))
    marker = os.path.join(out_dir, f"_done_{cfg.n_convs}_{cfg.seed}_{shards}")
    turns_dir = os.path.join(out_dir, "turns")
    if os.path.exists(marker):
        return turns_dir
    os.makedirs(turns_dir, exist_ok=True)
    os.makedirs(os.path.join(out_dir, "truth"), exist_ok=True)
    # a previous layout with a different config leaves stale files a
    # glob reader would double-count — clear them, AND clear the old
    # config's marker: a surviving marker would otherwise claim files
    # this call is about to delete (a later call with that config
    # would silently return the wrong corpus)
    import glob as _glob

    for stale in _glob.glob(os.path.join(turns_dir, "*.parquet")):
        os.remove(stale)
    for stale in _glob.glob(os.path.join(out_dir, "_done_*")):
        os.remove(stale)
    transcripts, dup_truth = generate_transcripts(cfg)
    # shard on conv hash: resumable layout, one file per shard
    import pyarrow.compute as pc

    conv = transcripts["conv_id"]
    shard_ids = pa.array(
        [hash64_stable(c.as_py()) % shards for c in pa.chunked_array(conv).combine_chunks()],
        pa.int32(),
    )
    for s in range(shards):
        part = transcripts.filter(pc.equal(shard_ids, s))
        pq.write_table(part, os.path.join(turns_dir, f"transcripts-{s:04d}.parquet"))
    pq.write_table(dup_truth, os.path.join(out_dir, "truth", "dup_truth.parquet"))
    with open(marker, "w") as f:
        f.write("ok")
    return turns_dir


# ---------------------------------------------------------------------------
# person-record fixture (reference-parity surface)

# gender-paired name pools (reference parity: utils/data_generator.py
# uses faker + gender_guesser to keep patronymics consistent with the
# first name's gender; we pair curated pools by index instead — same
# invariant, no external packages).  Russian female surnames are the
# male form + "а" (-ов/-ев/-ин declension); female patronymics use
# -овна/-евна.
_RU_SURNAMES = ["Иванов", "Петров", "Сидоров", "Смирнов", "Кузнецов", "Попов",
                "Васильев", "Михайлов", "Новиков", "Фёдоров", "Морозов", "Волков"]
_RU_NAMES = ["Иван", "Пётр", "Алексей", "Михаил", "Николай", "Сергей",
             "Владимир", "Андрей", "Дмитрий", "Павел"]
_RU_PATRONYMICS = ["Иванович", "Петрович", "Алексеевич", "Михайлович",
                   "Николаевич", "Сергеевич", "Владимирович", "Андреевич"]
_RU_NAMES_F = ["Анна", "Мария", "Елена", "Ольга", "Наталья", "Ирина",
               "Татьяна", "Светлана", "Екатерина", "Людмила"]
_RU_PATRONYMICS_F = ["Ивановна", "Петровна", "Алексеевна", "Михайловна",
                     "Николаевна", "Сергеевна", "Владимировна", "Андреевна"]
_EN_SURNAMES = ["Smith", "Johnson", "Brown", "Taylor", "Anderson", "Thomas",
                "Jackson", "White", "Harris", "Martin", "Thompson", "Wilson"]
_EN_NAMES = ["James", "John", "Robert", "Michael", "William", "David",
             "Richard", "Joseph", "Charles", "Daniel"]
_EN_NAMES_F = ["Mary", "Patricia", "Jennifer", "Linda", "Elizabeth", "Barbara",
               "Susan", "Jessica", "Sarah", "Karen"]
_DOMAINS = ["example.com", "mail.ru", "gmail.com", "yandex.ru", "test.org"]


@dataclass(frozen=True)
class PersonGenConfig:
    n_records: int = 200
    seed: int = 42
    language: str = "ru"  # "ru" | "en" | "mixed"
    double_char_probability: float = 0.1
    change_char_probability: float = 0.15
    swap_char_probability: float = 0.1
    suffix_probability: float = 0.05
    email_noise_probability: float = 0.2
    suffixes: tuple[str, ...] = ("-младший", "-старший", " Jr", " Sr")
    # reference-generator fidelity knobs (off by default so existing
    # fixtures stay byte-identical; reference data_generator.py:172-232,
    # 322-373): full surname replacement regenerates the email local
    # part wholesale; phone distortion duplicates a random digit
    change_name_probability: float = 0.0
    include_phone: bool = False
    double_number_probability: float = 0.3


def generate_person_records(cfg: PersonGenConfig) -> tuple[list[dict], list[dict]]:
    """Original + distorted-variant record lists (reference shape:
    ``id``, surname/name/patronymic, email — see FIXTURES.md F3)."""
    rng = _rng(cfg.seed)
    originals: list[dict] = []
    variants: list[dict] = []
    for i in range(cfg.n_records):
        lang = cfg.language
        if lang == "mixed":
            lang = "ru" if rng.random() < 0.5 else "en"
        # gender first, then gender-consistent pools (reference
        # invariant: a female first name never gets a male patronymic)
        female = rng.random() < 0.5
        if lang == "ru":
            last = _RU_SURNAMES[int(rng.integers(0, len(_RU_SURNAMES)))]
            if female:
                last += "а"
                first = _RU_NAMES_F[int(rng.integers(0, len(_RU_NAMES_F)))]
                middle = _RU_PATRONYMICS_F[int(rng.integers(0, len(_RU_PATRONYMICS_F)))]
            else:
                first = _RU_NAMES[int(rng.integers(0, len(_RU_NAMES)))]
                middle = _RU_PATRONYMICS[int(rng.integers(0, len(_RU_PATRONYMICS)))]
        else:
            last = _EN_SURNAMES[int(rng.integers(0, len(_EN_SURNAMES)))]
            pool = _EN_NAMES_F if female else _EN_NAMES
            first = pool[int(rng.integers(0, len(pool)))]
            middle = pool[int(rng.integers(0, len(pool)))]
        email = f"{first.lower()}.{last.lower()}{i}@{_DOMAINS[int(rng.integers(0, len(_DOMAINS)))]}"
        rec = {
            "id": f"record_{i + 1}",
            "last_name": last,
            "first_name": first,
            "middle_name": middle,
            "email": email,
        }
        if cfg.include_phone:
            digits = rng.integers(0, 10, size=10)
            prefix = "+7" if lang == "ru" else "+1"
            rec["phone"] = prefix + "".join(str(d) for d in digits)
        originals.append(rec)

        var = dict(rec)
        var["id"] = rec["id"] + "_v"
        # full-identity replacement takes priority over char noise
        # (reference data_generator.py:322-373): the surname is swapped
        # wholesale and the email local part regenerated to match
        if cfg.change_name_probability and rng.random() < cfg.change_name_probability:
            pool = _RU_SURNAMES if lang == "ru" else _EN_SURNAMES
            var["last_name"] = pool[int(rng.integers(0, len(pool)))]
            domain = var["email"].partition("@")[2]
            var["email"] = f"{var['first_name'].lower()}.{var['last_name'].lower()}{i}@{domain}"
        else:
            for fld in ("last_name", "first_name", "middle_name"):
                s = var[fld]
                if rng.random() < cfg.double_char_probability:
                    s = _double_char(rng, s)
                if rng.random() < cfg.change_char_probability:
                    s = _change_char(rng, s)
                if rng.random() < cfg.swap_char_probability:
                    s = _swap_chars(rng, s)
                var[fld] = s
            if rng.random() < cfg.suffix_probability:
                var["last_name"] += cfg.suffixes[int(rng.integers(0, len(cfg.suffixes)))]
            if rng.random() < cfg.email_noise_probability:
                local, _, domain = var["email"].partition("@")
                local = _change_char(rng, local)
                var["email"] = local + "@" + domain
        if cfg.include_phone and rng.random() < cfg.double_number_probability:
            p = var["phone"]
            j = int(rng.integers(2, len(p)))  # never the +country prefix
            var["phone"] = p[: j + 1] + p[j] + p[j + 1 :]
        variants.append(var)
    return originals, variants


def person_records_table(records: list[dict]) -> pa.Table:
    cols = {k: [r[k] for r in records] for k in records[0]}
    return pa.table({k: pa.array(v, pa.string()) for k, v in cols.items()})
