"""duwamish_spark — a from-scratch PySpark-native BSP link-graph engine.

Capability-parity target: adpowers/duwamish (a single-node multi-threaded
Pregel clone; see /root/reference). This package is NOT a port: the
reference's thread-pool/barrier/spill machinery (its ``Duwamish.java``,
``Partition.java``, ``MergeSorter.java``) is replaced wholesale by Spark's
shuffle, Tungsten sort, and Catalyst-planned joins. What survives is the
*semantic contract*: hash-partitioned vertex state, per-superstep message
exchange combined per destination, vertex update, named global accumulators,
vote-to-halt, and checkpointed state rotation
(reference: src/org/andrewhitchcock/duwamish/model/Vertex.java:23-24,
Context.java:50-65, Duwamish.java:152-179, Partition.java:240-262).

Layout
------
- :mod:`duwamish_spark.session`    — tuned SparkSession factory
- :mod:`duwamish_spark.corpus`     — deterministic source-code corpus synthesizer
- :mod:`duwamish_spark.parse`      — vectorized import/include → edge extraction
- :mod:`duwamish_spark.graph`      — vertices/edges/degrees derivations
- :mod:`duwamish_spark.pregel`     — the superstep driver (checkpoint, metrics,
  halt, resume, salting)
- :mod:`duwamish_spark.algorithms` — pagerank, components, labelprop,
  triangles, sssp, recommend
- :mod:`duwamish_spark.functions`  — training-data-pipeline ops (dedup,
  similarity, text analysis)
"""

__version__ = "0.1.0"
