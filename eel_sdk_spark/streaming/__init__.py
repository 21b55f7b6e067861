"""Structured Streaming surface.

The reference has no true streaming (SURVEY.md §2.9): its closest artifacts
are ``HdfsWatcher`` (poll a directory for appearing files) and
``DataStreamPublisher`` (manually-fed push stream). Both map onto
Structured Streaming primitives, which also give the watermark/window/state
machinery a web-scale ingest pipeline actually needs.
"""

from .sources import file_watcher_stream, publisher_stream  # noqa: F401
from .pipeline import (  # noqa: F401
    streaming_dedup,
    streaming_encode,
    windowed_counts,
)
