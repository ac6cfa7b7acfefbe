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
