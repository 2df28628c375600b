"""Run-scoped persist lifecycle (caching.py)."""

from __future__ import annotations

from advanced_strapi_import_spark import caching


def test_persist_tracked_release(spark):
    df = caching.persist_tracked(spark.range(10))
    df.count()
    assert df.storageLevel.useMemory
    released = caching.release_tracked()
    assert released >= 1
    assert not df.storageLevel.useMemory
    # releasing again is a no-op, not an error
    assert caching.release_tracked() == 0


def test_registry_query_releases_previous(spark, tmp_path):
    """Invoking any registry query frees the prior query's tracked
    persists — the safety net for harnesses that never call release."""
    import advanced_strapi_import_spark.plans.all  # noqa: F401
    from advanced_strapi_import_spark.plans.registry import QUERIES
    from tests.conftest import SF_TEST

    leftover = caching.persist_tracked(spark.range(5))
    leftover.count()
    assert leftover.storageLevel.useMemory
    QUERIES["dedup_exact_groups"].fn(spark, SF_TEST).count()
    assert not leftover.storageLevel.useMemory
    caching.release_tracked()


def test_release_all_clears_shared_band_cache(spark):
    import advanced_strapi_import_spark.plans.all  # noqa: F401
    from advanced_strapi_import_spark.plans import parity_ml as ML
    from tests.conftest import SF_TEST

    bands = ML._shared_bands(spark, SF_TEST)
    bands.count()
    assert ML._SHARED  # populated
    caching.release_all()
    assert not ML._SHARED
    assert not bands.storageLevel.useMemory
