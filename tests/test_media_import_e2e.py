"""E2E: media ZIP -> routed files -> CSV import with media ids attached
by the 3-pattern filename match (FIXTURES.md §6, reference flow
upload-media-zip -> import with mediaFieldMappings)."""

from __future__ import annotations

import io
import zipfile

import pytest

from advanced_strapi_import_spark.api import Engine
from advanced_strapi_import_spark.schema import Registry

CHALLAN_REGISTRY = Registry.from_dict(
    {
        "contentTypes": {
            "challan": {
                "uid": "api::challan.challan",
                "attributes": {
                    "challan_no": {"type": "string", "required": True},
                    "description": {"type": "string"},
                    "reports": {"type": "media"},
                    "challan_docs": {"type": "media"},
                },
            },
        },
        "components": {},
    }
)


@pytest.fixture()
def engine(spark, tmp_path):
    return Engine(spark=spark, registry=CHALLAN_REGISTRY,
                  storage_root=str(tmp_path / "store"))


def test_media_zip_import_flow(engine, tmp_path):
    # 1. media zip with foldered entries (reports/, challan_docs/)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("reports/CH001.pdf", b"r1")
        zf.writestr("reports/CH001_02.pdf", b"r2")
        zf.writestr("reports/CH002_report.pdf", b"r3")
        zf.writestr("challan_docs/CH001_delivery.pdf", b"c1")
    zp = tmp_path / "media.zip"
    zp.write_bytes(buf.getvalue())
    routed = engine.ingest_media_zip(str(zp), "challan", "challan_no")
    assert {r["field"] for r in routed.collect()} == {"reports", "challan_docs"}

    # 2. CSV import matched by challan_no
    p = tmp_path / "challans.csv"
    p.write_text(
        "challan_no,description\nCH001,Coal sample\nCH002,Iron sample\nCH999,No media\n"
    )
    out = engine.import_csv(str(p), "challan", media_match_field="challan_no")
    assert out["created"] == 3

    rows = {r["challan_no"]: r for r in engine.table("challan").collect()}
    # CH001: exact + numbered in reports (sorted by lowercase name), one challan_doc
    assert len(rows["CH001"]["reports"]) == 2
    assert len(rows["CH001"]["challan_docs"]) == 1
    # CH002: startswith match
    assert len(rows["CH002"]["reports"]) == 1
    # CH999: no files -> null (reference leaves field unset)
    assert rows["CH999"]["reports"] is None
