"""Property tests for the dissect compiler.

Two invariants, mirroring the reference's corpus + stress coverage:

1. the static-regex path (what Spark executes) agrees with the pure
   positional reference implementation (`DissectPattern.parse`) on
   arbitrary values — checked in-process with `re` (fast, wide), and
2. Spark execution agrees with `parse` over a seeded random corpus in
   ONE batched job (per-example Spark jobs would be prohibitively slow).
"""

from __future__ import annotations

import random
import re as _re

from hypothesis import given, settings
from hypothesis import strategies as st

from beats_spark.dissect import compile_tokenizer

TOKENIZERS = [
    "key=%{k} val=%{v}",
    "%{a}|%{b}|%{c}",
    "%{ip} - %{user} [%{ts}]",
    '%{level}: %{msg}',
]

# values must not contain a delimiter of the tokenizer under test
value = st.text(
    alphabet=st.characters(whitelist_categories=("L", "N"), max_codepoint=0x2FF),
    min_size=1,
    max_size=20,
)


def render(tok: str, pat, vals: list[str]) -> str:
    out = tok
    for f, v in zip(pat.fields, vals):
        out = out.replace("%{" + f.name + "}", v, 1)
    return out


@settings(max_examples=300, deadline=None)
@given(data=st.data())
def test_static_regex_agrees_with_reference_parse(data):
    tok = data.draw(st.sampled_from(TOKENIZERS))
    pat = compile_tokenizer(tok)
    vals = [data.draw(value) for _ in pat.fields]
    msg = render(tok, pat, vals)

    want = pat.parse(msg)
    m = _re.match(pat.regex, msg)
    assert (m is not None) == (want is not None)
    if want is not None:
        got = {f.name: m.group(f.group) for f in pat.output_fields()}
        assert got == want


@settings(max_examples=200, deadline=None)
@given(junk=st.text(max_size=40))
def test_nonmatching_lines_fail_both_paths(junk):
    pat = compile_tokenizer("key=%{k} val=%{v}")
    want = pat.parse(junk)
    m = _re.match(pat.regex, junk)
    assert (m is not None) == (want is not None)


def test_spark_agrees_with_reference_on_random_corpus(spark):
    rng = random.Random(42)
    alphabet = "abcdefghijklmnop0123456789_.:-"
    tok = "key=%{k} val=%{v} tail=%{t}"
    pat = compile_tokenizer(tok)

    def rand_val():
        return "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 15)))

    msgs = []
    for i in range(300):
        if i % 7 == 3:
            msgs.append(rng.choice(["", "garbage line", "key= only"]) + rand_val())
        else:
            msgs.append(render(tok, pat, [rand_val(), rand_val(), rand_val()]))

    from beats_spark.dissect import dissect

    df = spark.createDataFrame([(m,) for m in msgs], "message string")
    got_rows = dissect(df, tok, target_prefix="d").select("message", "d").collect()
    got = {r["message"]: (dict(r["d"].asDict()) if r["d"] is not None else None)
           for r in got_rows}
    for m in msgs:
        assert got[m] == pat.parse(m), m
