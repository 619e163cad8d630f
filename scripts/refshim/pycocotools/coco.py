from cl4wsis_tpu.data.cocojson import CocoJson as COCO  # noqa: F401
