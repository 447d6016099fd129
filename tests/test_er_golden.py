"""Golden-match entity-resolution validation (SURVEY.md §5 item 3 /
FIXTURES.md A2): a deterministic generator plants exact copies,
abbreviation variants, and in-threshold typos into an establishments
table — plus decoys that share only generic words — and the blocked
similarity join must reproduce the golden (merchant, establishment,
provenance) table EXACTLY: every planted match found with the right
provenance tier, zero false positives on decoys."""

from __future__ import annotations

import pytest

from cdc_makanmana_spark.operators.similarity import similarity_join

# Specific (non-generic) name vocabulary — none of these appear in
# operators.similarity.GENERIC_WORDS. Each name position draws from its
# own suffixed vocabulary so (a) the 4 tokens of one name are always
# distinct and (b) the token tuple — hence the name — is UNIQUE per
# merchant id (positional base-20 encoding of i).
# Construction constraints, forced by the word-match relation
# (containment either way OR levenshtein ratio >= 0.8):
# - equal length + distinct everywhere → no containment matches;
# - within a position, triple-letter codes differ in all 3 chars →
#   distance 3, ratio 4/7 < 0.8; across positions the 4-char prefix
#   differs in all 4 chars → ratio <= 3/7. So no two DIFFERENT
#   merchants' tokens ever fuzzy-match; only the planted one-char
#   typo variants (ratio 7/8) cross the 0.8 line.
_PREFIX = ["bana", "ceri", "dodo", "fika"]
_CODES = [c * 3 for c in "bcdfghjklmnpqrstvwxz"]
_POS_VOCAB = [[p + c for c in _CODES] for p in _PREFIX]


def _merchant_name(i: int) -> str:
    t = [_POS_VOCAB[k][(i // (20**k)) % 20] for k in range(4)]
    return " ".join(t) + " restaurant"


def _postal(i: int) -> str:
    return f"{(i % 20) + 100:03d}{i % 1000:03d}"


@pytest.fixture(scope="module")
def er_golden(spark):
    merchants, establishments, golden = [], [], []
    n = 120
    for i in range(n):
        name = _merchant_name(i)
        m_id = f"M{i:04d}"
        merchants.append((m_id, name, _postal(i)))
        e_id = f"E{i:04d}"
        kind = i % 4
        if kind == 0:
            # exact copy, same postal → EXACT_POSTAL
            establishments.append((e_id, name, _postal(i)))
            golden.append((m_id, e_id, "EXACT_POSTAL"))
        elif kind == 1:
            # exact copy after suffix-cleaning, different postal → EXACT_NAME
            establishments.append((e_id, name + " pte ltd", _postal(i + 1)))
            golden.append((m_id, e_id, "EXACT_NAME"))
        elif kind == 2:
            # one-char typo in the first specific token (levenshtein
            # ratio >= 0.8) + abbreviation restaurant→rest:
            # 3 exact specific + 1 fuzzy + 1 abbrev = 5/5 matching,
            # same postal → SIMILAR_POSTAL
            words = name.split()
            words[0] = words[0] + "x"
            words[-1] = "rest"
            establishments.append((e_id, " ".join(words), _postal(i)))
            golden.append((m_id, e_id, "SIMILAR_POSTAL"))
        else:
            # decoy: shares ONE specific token + only generic words —
            # must NOT match (specific-token gate + score gate)
            shared = name.split()[0]
            establishments.append(
                (e_id, f"{shared} western food kitchen house", _postal(i + 7))
            )
            golden.append((m_id, None, None))

    m_df = spark.createDataFrame(merchants, "id string, name string, postalCode string")
    e_df = spark.createDataFrame(
        establishments, "establishment_id string, name string, postal string"
    )
    return m_df, e_df, golden


def test_er_reproduces_golden_matches_exactly(spark, er_golden):
    m_df, e_df, golden = er_golden
    out = similarity_join(
        m_df, e_df,
        left_name="name", right_name="name",
        left_id="id", right_id="establishment_id",
        left_postal="postalCode", right_postal="postal",
    )
    got = {r["id_l"]: (r["establishment_id_r"], r["match_source"]) for r in out.collect()}

    missed, wrong, false_pos = [], [], []
    for m_id, e_id, source in golden:
        g_e, g_src = got.get(m_id, (None, None))
        if e_id is None:
            if g_e is not None:
                false_pos.append((m_id, g_e, g_src))
        elif g_e is None:
            missed.append((m_id, e_id, source))
        elif g_e != e_id or g_src != source:
            wrong.append((m_id, (e_id, source), (g_e, g_src)))

    assert not false_pos, f"decoys matched: {false_pos[:5]}"
    assert not missed, f"planted matches missed: {missed[:5]}"
    assert not wrong, f"wrong match/provenance: {wrong[:5]}"


def test_er_golden_all_four_tiers_present(er_golden):
    _, _, golden = er_golden
    sources = {s for _, _, s in golden if s}
    assert sources == {"EXACT_POSTAL", "EXACT_NAME", "SIMILAR_POSTAL"}
    assert sum(1 for _, e, _ in golden if e is None) >= 25  # enough decoys
