"""Round-13 evidence-rotation tripwire (VERDICT r12 item 1).

The driver consumes ``queries()`` in dict order under a 50-row budget.
Round 12's window was frozen at round open as a pure staleness refresh,
so the ~30 queries round 12 then changed — including its biggest wins —
got no official oracle row.  The r13 window therefore LEADS with the
recheck-changed block (every name whose executable logic changed in
round 12, directly or via a shared helper) and fills the remaining
slots from the declared round-6 staleness queue.
"""

from __future__ import annotations

from i3cols_spark.operators import ORACLES, QUERIES


def test_surface_order_round13_rotation():
    import __spark_entry__ as entrymod
    from i3cols_spark.operators.registry import (
        _R13_PRIORITY,
        _R13_RECHECK_CHANGED,
        _R13_STALE_FILL,
        _R13_STALE_QUEUE,
    )

    order = list(entrymod.queries())
    assert len(_R13_PRIORITY) == 50
    assert len(set(_R13_PRIORITY)) == 50
    assert order[:50] == list(_R13_PRIORITY)
    assert sorted(order) == sorted(QUERIES)

    # Window composition: recheck-changed block first, then the stale
    # fill, which must be exactly the FIRST queue names not already
    # consumed by the recheck block (no cherry-picking easy slots).
    window = list(_R13_PRIORITY)
    assert tuple(window[: len(_R13_RECHECK_CHANGED)]) == _R13_RECHECK_CHANGED
    assert tuple(window[len(_R13_RECHECK_CHANGED) :]) == _R13_STALE_FILL
    expected_fill = [
        n for n in _R13_STALE_QUEUE if n not in set(_R13_RECHECK_CHANGED)
    ][: len(_R13_STALE_FILL)]
    assert list(_R13_STALE_FILL) == expected_fill

    # The heavy round-12 wins the verdict called out MUST be in the
    # recheck block — this is the clause the r13 window exists for.
    mandated = {
        "q_dedup_simhash_verified",
        "q_graph_hits",
        "q_graph_triangles",
        "q_graph_conductance",
        "q_dedup_near_minhash",
        "q_dedup_lsh_eval",
        "q_text_minhash_estimate_error",
        "q_quality_split_leakage",
        "q_basket_assoc_rules",
        "q_basket_assoc_rules_rel",
        "q_similarity_ivf_recall_curve",
        "q_similarity_knn_batch",
        "q_similarity_knn_batch_ivf",
        "q_entity_resolution",
        "q_join_fuzzy_names",
        "q_multimodal_video_frames",
        "q_multimodal_gif_anim",
        "q_multimodal_scene_cuts",
        "q_text_minhash_signature",
        "q_embedding_hard_negatives",
        "q_dedup_minhash_cluster_rep",
        "q_dedup_minhash_cluster_rep_verified",
        "q_dedup_ngram_cluster_rep",
        "q_dedup_embedding_cluster_rep",
        "q_graph_clustering_coef",
        "q_dedup_simhash",
    }
    missing = mandated - set(_R13_RECHECK_CHANGED)
    assert not missing, missing

    # Every window slot must produce a hash row, never a no_oracle
    # record, and every name must be registered.
    assert all(n in QUERIES for n in window)
    no_oracle = [n for n in window if n not in ORACLES]
    assert not no_oracle, no_oracle
