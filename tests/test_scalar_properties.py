"""Property-based robustness for the scalar layer (hypothesis).

At 10^12-file scale the parse stage WILL see garbage; every scalar
function must be total (no uncaught exceptions) and, where meaningful,
idempotent.  Record-level failures degrade to error rows, never task
failures."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from xmltoldmigration_spark.functions import lang as L
from xmltoldmigration_spark.functions import text as T

any_text = st.text(max_size=80)


@settings(max_examples=300, deadline=None)
@given(any_text)
def test_normalize_string_total_and_stable(s):
    # not strictly idempotent (the reference's wrapping-quote strip makes
    # `' "'` -> `'"'` -> `''`, CommonMigration.java:723-727) but must
    # stabilize and never raise
    a = T.normalize_string(s)
    b = T.normalize_string(a)
    assert T.normalize_string(b) == b


@settings(max_examples=300, deadline=None)
@given(any_text)
def test_parse_dates_total(s):
    for prop, lex, dt in T.parse_dates(s):
        assert prop in ("onYear", "notBefore", "notAfter", "eventWhen")
        assert isinstance(lex, str)


@settings(max_examples=300, deadline=None)
@given(any_text)
def test_ewts_functions_total(s):
    L.add_ewts_shad(s)
    L.normalize_ewts(s)
    L.ewts_has_warnings(s)
    L.is_likely_english(s)
    L.guess_lang(s)
    L.normalize_tibetan(s)


@settings(max_examples=200, deadline=None)
@given(any_text, any_text)
def test_bcp47_total(lang, enc):
    tag = L.get_bcp47(lang, enc, "en")
    assert tag is None or isinstance(tag, str)


@settings(max_examples=200, deadline=None)
@given(any_text)
def test_qcdate_total(s):
    from xmltoldmigration_spark.kg.migrators.imagegroup import qcdate_to_xsd

    r = qcdate_to_xsd(s)
    assert r is None or (isinstance(r[0], str) and r[1].startswith("http"))


@settings(max_examples=200, deadline=None)
@given(any_text)
def test_urls_total(s):
    T.normalize_tol_url(s)
    T.rid_from_tbrc_url(s)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=9999), min_size=1, max_size=30, unique=True))
def test_image_list_roundtrip_property(nums):
    from xmltoldmigration_spark.functions.imagelist import (
        encode_image_list,
        get_image_nums,
    )

    nums = sorted(nums)
    src = "|".join(f"IMG{n:04d}.tif" for n in nums)
    rle, total, missing, _ = encode_image_list(src)
    assert total == len(nums)
    decoded = get_image_nums(rle, missing)
    # every encoded image decodes to its ordinal position among pages
    assert set(decoded) == {f"img{n:04d}.tif" for n in nums}


# ---------------------------------------------------------------- simhash

@given(st.lists(st.text(alphabet="abcdefg ", min_size=0, max_size=30), max_size=20))
@settings(max_examples=50, deadline=None)
def test_simhash_deterministic_and_batch_consistent(texts):
    import pandas as pd

    from xmltoldmigration_spark.operators.simhash import _simhash_values, simhash64

    s = pd.Series(texts, dtype=object)
    batch = _simhash_values(s.fillna("").str.split())
    for t, v in zip(texts, batch):
        assert simhash64(t) == int(v)
        assert simhash64(t) == simhash64(t)


@given(
    st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=33, max_codepoint=126),
            min_size=1,
            max_size=40,
        ),
        min_size=1,
        max_size=200,
    )
)
@settings(max_examples=50, deadline=None)
def test_simhash_byte_hash_matches_pandas(tokens):
    """_pd_hash_tokens (vectorized siphash24+splitmix64 over a concatenated
    buffer) must be bit-identical to pandas.util.hash_array on the same
    token strings — the contract that keeps the dedup_simhash golden
    fixture unchanged across the byte-domain rewrite."""
    import numpy as np
    import pandas as pd

    from xmltoldmigration_spark.operators.simhash import _pd_hash_tokens

    buf = np.frombuffer((" ".join(tokens) + " ").encode(), dtype=np.uint8)
    starts, lens, pos = [], [], 0
    for t in tokens:
        starts.append(pos)
        lens.append(len(t))
        pos += len(t) + 1
    mine = _pd_hash_tokens(buf, np.array(starts), np.array(lens))
    ref = pd.util.hash_array(np.array(tokens, dtype=object))
    assert np.array_equal(mine, ref)


@given(
    st.lists(
        st.text(
            # printable ASCII + every ASCII char str.split() treats as
            # whitespace (incl. the C0 separators \x1c-\x1f)
            alphabet=st.characters(min_codepoint=0, max_codepoint=127),
            min_size=0,
            max_size=80,
        ),
        min_size=0,
        max_size=40,
    )
)
@settings(max_examples=80, deadline=None)
def test_simhash_ascii_path_equals_split_path(texts):
    """The zero-object byte-domain tokenizer must reproduce str.split()
    exactly on ASCII input (including runs of mixed whitespace, control
    chars, empty and whitespace-only docs)."""
    import numpy as np
    import pandas as pd

    from xmltoldmigration_spark.operators.simhash import _simhash_ascii, _simhash_values

    a = _simhash_ascii(texts)
    b = _simhash_values(pd.Series(texts, dtype=object).fillna("").str.split())
    assert np.array_equal(a, b)


def test_simhash_unicode_fallback_routes_to_split_path():
    import numpy as np
    import pandas as pd

    from xmltoldmigration_spark.operators.simhash import _simhash_from_texts, _simhash_values

    s = pd.Series(["héllo wörld", "plain ascii doc", " nbsp separated em"])
    assert np.array_equal(_simhash_from_texts(s), _simhash_values(s.str.split()))


def test_simhash_locality():
    from xmltoldmigration_spark.operators.simhash import hamming64, simhash64

    base = "the quick brown fox jumps over the lazy dog " * 30
    near = base + "one extra token"
    far = "completely different material about parquet row groups " * 30
    assert hamming64(simhash64(base), simhash64(near)) <= 6
    assert hamming64(simhash64(base), simhash64(far)) >= 20


# ---------------------------------------------------------------- rkts ttl

@given(st.integers(min_value=0, max_value=3))
@settings(max_examples=10, deadline=None)
def test_rkts_routing_pure(i):
    from xmltoldmigration_spark.kg.transfers import rkts

    ttl = ('@prefix bdr: <http://purl.bdrc.io/resource/> .\n'
           '@prefix bdo: <http://purl.bdrc.io/ontology/core/> .\n'
           f'bdr:X{i} a bdo:Work .\n')
    rid = rkts.EDITION_RIDS[i]
    rows = rkts.triples_for_file(f"{rid}_00{i}.ttl", ttl, False)
    assert rows and all(r[0] == "triple" and r[1] == rid for r in rows)
    rows_split = rkts.triples_for_file(f"{rid}_00{i}.ttl", ttl, True)
    assert all(r[1] == "O" + rid[2:] for r in rows_split)
    # WA0R abstract gains exactly 4 admin sidecar triples
    wa_rows = rkts.triples_for_file(f"WA0RT{i:04d}.ttl", ttl, False)
    adm = "http://purl.bdrc.io/ontology/admin/"
    assert sum(1 for r in wa_rows if r[2].startswith("http://purl.bdrc.io/admindata/")
               or r[3].startswith(adm)) >= 3
