from . import pipeline, tracker_stream  # noqa: F401
