"""Content-type registry for the driver's synthetic tables — the analog
of the reference's runtime `strapi.contentTypes` catalog, describing how
the TPC-H-ish parquet tables map onto the engine's dynamic-schema model
(FIXTURES.md "Mapping onto the driver's synthetic tables")."""

from __future__ import annotations

from advanced_strapi_import_spark.schema import Registry

# Segments deliberately EXCLUDE 'MACHINERY' so the enum validator has
# real rejections in the synthetic data.
SEGMENT_ENUM = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD"]

TESTDATA_REGISTRY = Registry.from_dict(
    {
        "contentTypes": {
            # dimension used as FK-resolution target (country analog)
            "nation_dim": {
                "uid": "api::nation.nation",
                "attributes": {
                    "id": {"type": "integer"},
                    "name": {"type": "string", "unique": True},
                },
            },
            # import-shaped view of `customer` (company/users analog):
            # all-string CSV columns validated+casted by the engine
            "customer_import": {
                "uid": "api::customer.customer",
                "attributes": {
                    "custkey": {"type": "integer"},
                    "name": {"type": "string", "required": True},
                    "acctbal": {"type": "float"},
                    "active": {"type": "boolean"},
                    "email": {"type": "email"},
                    "segment": {"type": "enumeration", "enum": SEGMENT_ENUM},
                },
            },
            # relation-resolution fact: value column -> nation_dim FK
            "cust_rel_import": {
                "uid": "api::custrel.custrel",
                "attributes": {
                    "custkey": {"type": "integer"},
                    "nation": {
                        "type": "relation",
                        "relation": "manyToOne",
                        "target": "nation_dim",
                    },
                    "nations": {
                        "type": "relation",
                        "relation": "manyToMany",
                        "target": "nation_dim",
                    },
                },
            },
            # §3.1 composed-endpoint CT (round 12): every operator class
            # of the import pipeline on one content type — casts +
            # required/enum/email checks, an FK cascade relation, a
            # single component from dot columns, and a media field
            # filled by filename matching
            "customer_pipeline_import": {
                "uid": "api::custpipe.custpipe",
                "attributes": {
                    "custkey": {"type": "integer"},
                    "name": {"type": "string", "required": True},
                    "acctbal": {"type": "float"},
                    "active": {"type": "boolean"},
                    "email": {"type": "email"},
                    "segment": {"type": "enumeration", "enum": SEGMENT_ENUM},
                    "nation": {
                        "type": "relation",
                        "relation": "manyToOne",
                        "target": "nation_dim",
                    },
                    "address": {
                        "type": "component",
                        "component": "common.address",
                    },
                    "docs": {"type": "media"},
                },
            },
        },
        "components": {
            "common.address": {
                "uid": "common.address",
                "attributes": {
                    "city": {"type": "string"},
                    "zip": {"type": "integer"},
                },
            },
        },
    }
)
