from . import kafka, mgmt_api  # noqa: F401
