"""eel_sdk_spark — a PySpark-native columnar lightweight-compression engine.

A from-scratch rebuild of the *capability surface* of 51zero/eel-sdk
(reference at /root/reference, cited by file:line in docstrings), recentred
on per-column lightweight compression (dictionary, RLE, FSST-style symbol
tables, bit-packing, frame-of-reference) with codec auto-selection, executed
in vectorized Arrow UDFs (``mapInArrow`` / ``applyInPandas``) — never
per-row Python.

Modules
-------
- ``codecs``   — numpy/Arrow codec kernels (encode(arr) -> block, decode(block) -> arr)
- ``stats``    — per-chunk value-distribution sampler feeding the selector
- ``selector`` — codec auto-selection cost model (the engine's only "planner")
- ``encode``/``decode`` — mapInArrow pipeline stages
- ``blocks``   — encoded-block header pack/unpack
- ``table``    — manifest-based atomic table commits (Iceberg-style,
  jar-free; locked CAS commits, snapshot expiry, orphan GC)
- ``iceberg``  — real-Iceberg swap-in behind a classpath probe
- ``checkpoint`` — per-partition lineage + idempotent resume +
  manifest-side point-lookup pruning
- ``ops``      — the eel DataStream operator surface as DataFrame wrappers
- ``corpus``   — deterministic synthetic Common-Crawl-style webtext generator
- ``functions``— training-data pipeline ops: text analysis, dedup/LSH,
  similarity/ANN, multimodal plumbing, decontamination, sketch
  profiling, data mixing, sequence packing
"""

__version__ = "0.1.0"
