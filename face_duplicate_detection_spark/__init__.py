"""face_duplicate_detection_spark — a PySpark-native near-duplicate
detection and clustering engine over Common-Crawl-style web text.

Re-expresses the duplicate-detection semantics of the reference
(``yashpotdar-py/face-duplicate-detection``: greedy in-memory face
dedup, see ``/root/reference/duplicate_face.py`` and
``face_recognition_custom.py``) with scalable Spark primitives:

- k-char shingles + 128-perm MinHash + 64-bit SimHash signatures
  (vectorized Arrow/pandas UDFs, numpy matrix kernels)
- LSH band hashing into groupBy candidate buckets with bucket caps /
  chain pairing for heavy-hitter (boilerplate) skew
- exact-Jaccard verification with native array expressions
- iterative DataFrame connected components (min-label propagation
  with localCheckpoint lineage truncation)
- rolling-hash long-span (suffix) stage for exact substring dups
- checkpointed stage tables for mid-run resume

Everything is DataFrame API + pandas UDFs; no RDDs, no per-row Python.
"""

from face_duplicate_detection_spark.config import DedupConfig

__all__ = ["DedupConfig"]
__version__ = "0.1.0"
