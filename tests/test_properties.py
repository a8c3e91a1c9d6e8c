"""Property-based tests (hypothesis) for the vectorized kernels that have
an independent scalar definition: batched shingle hashing, the pipe wire
parser, the BMP codec, and the polynomial fingerprint hash. These hunt
the boundary cases the fixture corpora don't reach (weird whitespace,
short docs, malformed fields, odd image dims)."""

from datetime import datetime, timedelta

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

# text without newlines (wire lines) and without surrogates
_line_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",),
                           blacklist_characters="\n\r"),
    max_size=60)
_doc_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=120)


@settings(max_examples=60, deadline=None)
@given(st.lists(_doc_text, max_size=12), st.integers(2, 5))
def test_shingle_batch_equals_single(texts, k):
    """The batch kernel must agree with itself called one text at a time
    (doc-boundary handling, empty/short docs, unicode whitespace)."""
    from sagan_ray.datapipe.dedup import _shingle_hashes_batch

    batch = _shingle_hashes_batch(texts, k)
    for t, got in zip(texts, batch):
        want = _shingle_hashes_batch([t], k)[0]
        assert np.array_equal(got, want), (t, k)


@settings(max_examples=60, deadline=None)
@given(st.lists(
    st.tuples(
        st.sampled_from(["conv-1", "c", ""]),                     # conv
        st.sampled_from(["0", "17", "x", "-3", "", "3.5", "1_000",
                         "+7", "99999999999999999999",
                         "-9223372036854775808", "-2147483648"]),  # turn
        _line_text,                                               # role
        _line_text,                                               # tool
        st.one_of(                                                # ts
            st.datetimes(min_value=datetime(1990, 1, 1),
                         max_value=datetime(2100, 1, 1)).map(
                lambda d: d.replace(microsecond=0).isoformat()),
            st.integers(0, 2 ** 31).map(str),
            st.text(alphabet="abcdef ", max_size=8)),
        _line_text,                                               # text
        st.booleans()),                                           # truncate
    max_size=10))
def test_pipe_parser_matches_scalar_reference(rows):
    """Vectorized pipe parse ≡ a straightforward per-row reference."""
    from sagan_ray.sources.wire import (
        _SENTINEL_TS,
        PIPE_FIELDS,
        _parse_ts,
        parse_pipe_batch,
    )

    lines = []
    for conv, turn, role, tool, ts, text, truncate in rows:
        line = "|".join([conv, turn, role, tool, ts, text])
        if truncate:
            line = line.rsplit("|", 2)[0]      # drop fields → malformed
        lines.append(line)
    tbl = pa.table({"text": pa.array(lines, pa.large_string())})
    got = parse_pipe_batch(tbl).to_pylist()

    for line, g in zip(lines, got):
        parts = line.split("|", PIPE_FIELDS - 1)
        if len(parts) != PIPE_FIELDS:
            assert g["malformed"] and g["text"] == line
            continue
        import re as _re

        bad = False
        # the parser's documented turn spec: plain ASCII integer literal
        # within int32 range (stricter than python int())
        if _re.fullmatch(r"[+-]?\d+", parts[1]) and \
                -2 ** 31 <= int(parts[1]) <= 2 ** 31 - 1:
            turn = int(parts[1])
        else:
            turn, bad = 0, True
        t = _parse_ts(parts[4])
        if t is None:
            t, bad = _SENTINEL_TS, True
        assert g["conv_id"] == parts[0]
        assert g["turn_idx"] == turn
        assert g["role"] == parts[2]
        assert g["tool"] == parts[3]
        assert g["text"] == parts[5]
        assert g["malformed"] == bad
        if not bad:
            assert abs((g["ts"] - t) / timedelta(seconds=1)) < 1e-3, line


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 2 ** 32 - 1))
def test_bmp_roundtrip(h, w, seed):
    from sagan_ray.datapipe.multimodal import decode_bmp, encode_bmp

    img = np.random.default_rng(seed).integers(
        0, 256, (h, w, 3)).astype(np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=300))
def test_poly_hash_equals_per_byte_fold(data):
    """The vectorized dot-product polynomial hash must equal the scalar
    left-fold definition h = (h·p + b) mod 2^64."""
    from sagan_ray.datapipe.textstats import _POLY_P, _POLY_SEED, _poly_hash

    h = int(_POLY_SEED)
    for b in data:
        h = (h * int(_POLY_P) + b) & 0xFFFFFFFFFFFFFFFF
    assert _poly_hash(data) == h


_json_scalar = st.one_of(
    st.none(), st.booleans(), st.integers(-2**40, 2**40),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(max_size=30))


@settings(max_examples=50, deadline=None)
@given(st.lists(st.fixed_dictionaries(
    {},
    optional={
        "conv_id": st.text(max_size=12),
        "turn_idx": _json_scalar,
        "role": st.text(max_size=8),
        "tool": _json_scalar,
        "ts": st.one_of(st.text(max_size=25), st.integers(0, 2**33)),
        "text": st.text(max_size=40),
        "extra": st.dictionaries(st.text(max_size=5), _json_scalar,
                                 max_size=2),
    }), min_size=1, max_size=20))
def test_json_wire_fast_path_never_diverges(objs):
    """Whatever shape a JSON-lines batch takes, the public parse —
    which may or may not engage the pyarrow.json fast path — must equal
    the per-row spec loop byte for byte."""
    import json as _json

    import sagan_ray.sources.wire as w

    lines = [_json.dumps(o) for o in objs]
    tbl = pa.table({"text": pa.array(lines, pa.large_string())})
    got = w.parse_json_batch(tbl)
    orig = w._fast_map_ok
    w._fast_map_ok = lambda f: False
    try:
        want = w.parse_json_batch(tbl)
    finally:
        w._fast_map_ok = orig
    assert got.equals(want)


@settings(max_examples=80, deadline=None)
@given(
    st.lists(st.integers(-50, 50), max_size=40),            # point values
    st.lists(st.tuples(st.integers(-60, 60), st.integers(0, 30)),
             max_size=15),                                   # (lo, len)
    st.integers(1, 13),                                      # band width
)
def test_range_bucket_kernel_matches_brute(pv, ivls, bw):
    """_bucket_ranges with every band colocated in ONE bucket (the
    worst case for the per-replica clipping) must reproduce the brute
    O(N*M) pair set exactly — no double counts across a multi-band
    interval's replicas, no misses at band edges."""
    import numpy as np
    import pandas as pd

    from sagan_ray.datapipe.joins import _SIDE_L, _SIDE_R, _bucket_ranges

    pv = np.array(pv, dtype=np.int64)
    rows = []
    for p, v in enumerate(pv):
        rows.append((int(v) // bw, _SIDE_L, int(v), 0, p))
    for i, (lo, ln) in enumerate(ivls):
        hi = lo + ln
        if hi <= lo:
            continue
        for b in range(lo // bw, (hi - 1) // bw + 1):
            rows.append((b, _SIDE_R, lo, hi, i))
    df = pd.DataFrame(rows, columns=["band", "side", "v", "hi", "rid"])
    _, pid, iid, s, e = _bucket_ranges(df, bw)
    got = []
    for j in range(len(iid)):
        got.extend((int(iid[j]), int(p)) for p in pid[s[j]:e[j]])
    want = [(i, p) for i, (lo, ln) in enumerate(ivls) if ln > 0
            for p, v in enumerate(pv) if lo <= v < lo + ln]
    assert sorted(got) == sorted(want)


@settings(max_examples=40, deadline=None)
@given(st.dictionaries(
    st.text(alphabet="abcx", min_size=1, max_size=6),
    st.integers(1, 5), max_size=8),
    st.integers(0, 12))
def test_bpe_train_encode_against_naive(freq, n_merges):
    """train_bpe/encode_len vs an independent naive re-derivation:
    after training, re-applying the merges in rank order to each vocab
    word must reproduce the trained vocab states, and encode_len must
    equal that replay's length (the greedy-lowest-rank loop equals
    in-order replay when merges came from training on this vocab)."""
    from sagan_ray.datapipe.bpe import _merge_pass, encode_len, train_bpe

    merges = train_bpe(freq, n_merges)
    ranks = {p: r for r, p in enumerate(merges)}
    for w in freq:
        if not w:
            continue
        syms = list(w)
        for pair in merges:          # in-order replay of training merges
            syms = _merge_pass(syms, pair)
        assert encode_len(w, ranks) == len(syms), (w, merges)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.text(alphabet="ab", min_size=1, max_size=8),
                min_size=1, max_size=6),
       st.lists(st.tuples(st.sampled_from(["a", "b", "ab", "ba", "aa"]),
                          st.sampled_from(["a", "b", "ab", "ba", "aa"])),
                max_size=4))
def test_bpe_encode_merge_invariants(words, merges):
    """encode under an ARBITRARY merges table: token count is within
    [1, len(word)] and deterministic across calls."""
    from sagan_ray.datapipe.bpe import encode_len

    ranks = {}
    for p in merges:
        ranks.setdefault(p, len(ranks))
    for w in words:
        n1 = encode_len(w, ranks)
        assert 1 <= n1 <= len(w)
        assert n1 == encode_len(w, ranks)


@settings(max_examples=80, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 3),            # user
                          st.integers(0, 2),            # type code
                          st.integers(0, 40)),          # ts (us)
                max_size=25),
       st.integers(0, 15))                              # gap
def test_debounce_frame_matches_sequential(rows, gap):
    """The sorted shift-diff kernel must equal a per-stream sequential
    lag loop — incl. ts ties (id order), interleaved streams, gap 0."""
    import pandas as pd

    from sagan_ray.datapipe.events import debounce_frame

    df = pd.DataFrame({
        "event_id": np.arange(len(rows), dtype=np.int64),
        "user_id": np.array([r[0] for r in rows], np.int64),
        "event_type": np.array([f"t{r[1]}" for r in rows], object),
        "ts": pd.to_datetime(
            np.array([r[2] for r in rows], np.int64), unit="us"),
    })
    got = set(debounce_frame(df, gap_us=gap)["event_id"].tolist())

    want = set()
    last: dict = {}
    order = sorted(range(len(rows)),
                   key=lambda i: (rows[i][0], rows[i][1], rows[i][2], i))
    for i in order:
        k = (rows[i][0], rows[i][1])
        ts = rows[i][2]
        if k not in last or ts - last[k] > gap:
            want.add(i)
        last[k] = ts
    assert got == want


@settings(max_examples=80, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 2),            # conv code
                          st.integers(0, 2)),           # role code
                max_size=20))
def test_adjacent_pairs_matches_sequential(rows):
    """Vectorized shifted-mask pair extraction ≡ a per-conv sequential
    scan (conv boundaries, role exactness, turn order)."""
    import pyarrow as pa

    from sagan_ray.pipelines.aggregates import adjacent_pairs

    # unique turn_idx per conv in input order
    seen: dict = {}
    convs, turns, roles, texts = [], [], [], []
    for c, r in rows:
        t = seen.get(c, 0)
        seen[c] = t + 1
        convs.append(f"c{c}")
        turns.append(t)
        roles.append(f"r{r}")
        texts.append("x" * (t + 1))
    tbl = pa.table({"conv_id": pa.array(convs),
                    "turn_idx": pa.array(turns, pa.int32()),
                    "role": pa.array(roles),
                    "text": pa.array(texts)})

    import ray.data as rd
    out = adjacent_pairs(rd.from_arrow(tbl), prev_role="r0",
                         next_role="r1").to_pandas()
    # all-empty Dataset.to_pandas() loses columns — treat as empty set
    got = (set(zip(out["conv_id"], out["turn_idx"].astype(int)))
           if len(out) else set())

    want = set()
    by_conv: dict = {}
    for c, t, r in zip(convs, turns, roles):
        by_conv.setdefault(c, []).append((t, r))
    for c, lst in by_conv.items():
        lst.sort()
        for (pt, pr), (nt, nr) in zip(lst, lst[1:]):
            if pr == "r0" and nr == "r1":
                want.add((c, nt))
    assert got == want


_metric_text = st.text(
    alphabet=st.sampled_from("ab xy\t\né"), max_size=30)


@settings(max_examples=40, deadline=None)
@given(st.lists(_metric_text, min_size=1, max_size=8))
def test_metric_identity_and_bounds(texts):
    """Metric-family invariants on arbitrary (incl. non-ASCII,
    whitespace-heavy, empty) text: scoring a row against ITSELF gives
    BLEU 1/WER 0/chrF 1 whenever the row has content, and every score
    stays in its documented range."""
    import ray.data as rd

    from sagan_ray.datapipe.lines import (bleu_scores, chrf_scores,
                                          wer_scores)

    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "ref": pa.array(texts, pa.string()),
        "cand": pa.array(texts, pa.string())})
    ds = rd.from_arrow(tbl)
    b = (bleu_scores(ds, ref_col="ref", cand_col="cand").to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    w = (wer_scores(rd.from_arrow(tbl), ref_col="ref",
                    cand_col="cand").to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    c = (chrf_scores(rd.from_arrow(tbl), ref_col="ref",
                     cand_col="cand").to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    for i, t in enumerate(texts):
        has_words = len(t.split()) > 0
        has_bytes = len("".join(t.split())) > 0
        assert w.loc[i, "dist"] == 0
        assert w.loc[i, "wer"] == 0.0
        if has_words:
            assert b.loc[i, "bleu"] == 1.0
        else:
            assert b.loc[i, "bleu"] == 0.0
        if has_bytes:
            assert c.loc[i, "chrf"] == 1.0
        else:
            assert c.loc[i, "chrf"] == 0.0
    assert ((b["bleu"] >= 0) & (b["bleu"] <= 1)).all()
    assert ((c["chrf"] >= 0) & (c["chrf"] <= 1)).all()
    assert (w["wer"] >= 0).all()
