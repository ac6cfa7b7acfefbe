"""Post-training data ops (round 11): role-mask split/carry at pack
boundaries, and the joint DPO dedup criterion (same prompt + different
preferences must NOT collapse)."""

from __future__ import annotations

from oracle import agree_rows, crafted_dir

from serverless_mapreduce_spark.operators.posttraining import (
    CHAT_PACK_BUDGET,
    CHAT_TURN_LEN,
    chat_pack_role_masks,
    dpo_pair_dedup,
)


def _doc(doc_id, n_tokens, prefix, source="cc"):
    return {
        "doc_id": doc_id,
        "text": " ".join(f"{prefix}{i}" for i in range(n_tokens)),
        "lang": "en",
        "source": source,
    }


def test_chat_pack_masks_split_carry_and_alternation(spark, tmp_path_factory):
    assert (CHAT_TURN_LEN, CHAT_PACK_BUDGET) == (16, 128)
    # doc 1: 100 tokens -> turns [0,16)u [16,32)a ... [96,100)u
    # doc 2: 60 tokens, same source, cum_before=100 -> its assistant turn
    # [116,132) absolute CROSSES the pack boundary at 128 and must split
    # into two spans with the SAME mask
    docs = [_doc(1, 100, "w"), _doc(2, 60, "x")]
    d = crafted_dir(tmp_path_factory, "chatpack", docs)
    got = agree_rows(
        spark, d, chat_pack_role_masks, "chat_pack_role_masks", as_dicts=True
    )
    rows = {
        (r["conv_id"], r["turn_idx"], r["pack_id"]): r for r in got
    }
    # doc 1 turn 0: user, mask 0, pack 0, conversation-local [0, 16)
    r = rows[(1, 0, 0)]
    assert (r["role"], r["loss_mask"], r["tok_start"], r["tok_end"]) == (
        "user", 0, 0, 16,
    )
    # doc 1's tail turn is 4 tokens [96, 100)
    r = rows[(1, 6, 0)]
    assert (r["tok_start"], r["tok_end"], r["span_len"]) == (96, 100, 4)
    # doc 2 turn 1 (assistant, abs [116, 132)) splits across packs 0/1:
    # pack 0 gets [16, 28) of the conversation, pack 1 gets [28, 32) —
    # both spans keep mask 1 (no bleed across the split)
    a = rows[(2, 1, 0)]
    b = rows[(2, 1, 1)]
    assert (a["role"], a["loss_mask"]) == ("assistant", 1)
    assert (b["role"], b["loss_mask"]) == ("assistant", 1)
    assert (a["tok_start"], a["tok_end"], a["pack_offset"]) == (16, 28, 116)
    assert (b["tok_start"], b["tok_end"], b["pack_offset"]) == (28, 32, 0)
    # every non-terminal pack is exactly budget-full per source
    fill = {}
    for r in got:
        fill[r["pack_id"]] = fill.get(r["pack_id"], 0) + r["span_len"]
    assert fill[0] == CHAT_PACK_BUDGET and fill[1] == 160 - CHAT_PACK_BUDGET
    # roles strictly alternate with turn parity
    assert all(
        (r["turn_idx"] % 2 == 0) == (r["role"] == "user") for r in got
    )


def test_dpo_dedup_requires_all_three_legs(spark, tmp_path_factory):
    """Same prompt + different responses = conflicting supervision, NOT a
    duplicate: only the fully-repeated example pair may collapse."""
    shared_prompt = " ".join(f"p{i}" for i in range(12))  # sp=12 of n=20
    a_resp = " ".join(f"w{i}" for i in range(8))
    b_resp = " ".join(f"z{i}" for i in range(8))
    docs = [
        {"doc_id": 1, "text": f"{shared_prompt} {a_resp}", "lang": "en",
         "source": "cc"},
        {"doc_id": 2, "text": f"{shared_prompt} {b_resp}", "lang": "en",
         "source": "cc"},   # same prompt, different preferences
        {"doc_id": 3, "text": f"{shared_prompt} {a_resp}", "lang": "en",
         "source": "cc"},   # exact repeat of example 1
    ]
    d = crafted_dir(tmp_path_factory, "dpodedup", docs)
    got = agree_rows(spark, d, dpo_pair_dedup, "dpo_pair_dedup", as_dicts=True)
    pairs = {(r["ex_a"], r["ex_b"]) for r in got}
    assert pairs == {(1, 3)}
    r = next(iter(got))
    assert (
        r["prompt_jaccard"],
        r["chosen_jaccard"],
        r["rejected_jaccard"],
    ) == (1.0, 1.0, 1.0)


def test_dpo_length_bias_report_pins(spark, tmp_path_factory):
    """Crafted length edges: equal-length legs report zero bias; a
    chosen-always-longer corpus reports 10^6 ppm with a positive delta;
    combined length places rows in the right bucket (r12 op)."""
    from serverless_mapreduce_spark.operators.posttraining import (
        DPO_LEN_BUCKET,
        dpo_length_bias_report,
    )

    # n=20 tokens -> sp=12, mid=16: chosen = tokens[12:16], rejected =
    # tokens[16:20] (0-based). All tokens 2 chars -> equal legs.
    eq_tokens = [f"a{i % 10}" for i in range(20)]
    # skewed: chosen tokens 10 chars, rejected tokens 2 chars
    sk_tokens = [f"b{i % 10}" for i in range(12)]
    sk_tokens += [f"cccccccc{i}" for i in range(4)]   # chosen leg, 9-10 chars
    sk_tokens += [f"d{i}" for i in range(4)]          # rejected leg, 2 chars
    # big: every token 40 chars -> ch+rj = 4*41-1 + 4*41-1 = 327 chars
    # combined ~> bucket 1 at DPO_LEN_BUCKET=256
    big_tokens = ["e" * 39 + str(i % 10) for i in range(20)]
    docs = [
        {"doc_id": 1, "text": " ".join(eq_tokens), "lang": "en", "source": "eq"},
        {"doc_id": 2, "text": " ".join(sk_tokens), "lang": "en", "source": "sk"},
        {"doc_id": 3, "text": " ".join(big_tokens), "lang": "en", "source": "big"},
    ]
    d = crafted_dir(tmp_path_factory, "dpolen", docs)
    got = agree_rows(
        spark, d, dpo_length_bias_report, "dpo_length_bias_report",
        as_dicts=True,
    )
    by = {r["source"]: r for r in got}
    assert by["eq"]["chosen_longer_ppm"] == 0
    assert by["eq"]["len_delta_ppm"] == 0
    assert by["eq"]["len_bucket"] == 0
    assert by["sk"]["chosen_longer_ppm"] == 1_000_000
    assert by["sk"]["len_delta_ppm"] > 0
    # chosen leg: 'cccccccc0'..'cccccccc3' = 4*9+3 = 39 chars; rejected:
    # 'd0'..'d3' = 4*2+3 = 11 chars
    assert by["sk"]["sum_chosen_chars"] == 39
    assert by["sk"]["sum_rejected_chars"] == 11
    assert by["sk"]["len_delta_ppm"] == (39 - 11) * 1_000_000
    assert by["big"]["len_bucket"] == (163 + 163) // DPO_LEN_BUCKET == 1
