"""Column-level function library (pure Spark expressions; JVM-side, codegen'd).

Submodules:
* :mod:`.urls` — canonicalization, host/extension extraction, blocklists, DOI.
* :mod:`.text` — quality scoring, token counting, language-ID, shingles.
* :mod:`.hashing` — url hashing, minhash/simhash building blocks.
"""

from literature_crawler_spark.functions import hashing, text, urls  # noqa: F401
