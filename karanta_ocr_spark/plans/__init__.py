from karanta_ocr_spark.plans.partitioning import (
    with_domain,
    with_salt,
    with_size_bucket,
    prepare_for_extraction,
    apply_engine_conf,
    ENGINE_CONF,
)

__all__ = [
    "with_domain", "with_salt", "with_size_bucket",
    "prepare_for_extraction", "apply_engine_conf", "ENGINE_CONF",
]
