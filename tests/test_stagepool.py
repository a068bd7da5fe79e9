"""stagepool policy: plain-task path (concurrency=None) and dedicated
actor-pool path (explicit concurrency) must be result-identical for
every converted stage family (dedup LSH, lang-id, media decode)."""

import pandas as pd
import ray.data as rd


def _docs_fixture():
    rows = []
    for i in range(60):
        base = f"doc {i % 7} text body with shared shingles {'x' * (i % 5)}"
        rows.append(
            {"doc_id": i, "text": base + (" unique" if i % 7 == 3 else ""),
             "source": f"s{i % 3}", "lang": "en"}
        )
    return rd.from_pandas(pd.DataFrame(rows))


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_minhash_tasks_equal_actor_pool(ray_session):
    from pds_hw2_mpi_connected_components_ray.pipelines.dedup import minhash_lsh_pairs

    docs = _docs_fixture()
    tasks = minhash_lsh_pairs(docs, threshold=0.5).to_pandas()
    pool = minhash_lsh_pairs(docs, threshold=0.5, concurrency=2).to_pandas()
    pd.testing.assert_frame_equal(_sorted(tasks), _sorted(pool))


def test_lang_id_tasks_equal_actor_pool(ray_session):
    from pds_hw2_mpi_connected_components_ray.pipelines.textpipe import lang_id_stage

    docs = _docs_fixture()
    tasks = lang_id_stage(docs).to_pandas()
    pool = lang_id_stage(docs, concurrency=2).to_pandas()
    pd.testing.assert_frame_equal(_sorted(tasks), _sorted(pool))


def test_media_decode_tasks_equal_actor_pool(ray_session):
    from pds_hw2_mpi_connected_components_ray.pipelines.multimodal import (
        decode_media,
        media_from_documents,
    )

    media = media_from_documents(_docs_fixture()).materialize()
    tasks = decode_media(media).to_pandas()
    pool = decode_media(media, concurrency=2).to_pandas()
    pd.testing.assert_frame_equal(_sorted(tasks), _sorted(pool))
