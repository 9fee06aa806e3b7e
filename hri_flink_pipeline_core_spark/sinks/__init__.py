from . import kafka, kafka_tx, mgmt_api  # noqa: F401
