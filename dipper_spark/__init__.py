"""dipper_spark — a PySpark-native analytics/ETL engine with the query and
data-processing capabilities of monarch-initiative/dipper, re-expressed
Spark-first.

The reference (at /root/reference) is a single-threaded, row-at-a-time Python
ETL engine that emits RDF triples per biomedical source.  This engine keeps
the *semantics* (canonical triples data model, per-source pipelines, the full
operator inventory of SURVEY.md §2) but expresses every operator as
DataFrame/SQL transformations so that Catalyst/Tungsten/AQE pick physical
strategies, and the whole thing scales out by partitioning instead of never.

Layers
------
core/       triples schema, deterministic sha1 ids, CURIE expansion,
            literal handling (dipper-bit-compatible), translation tables
models/     pure triple-pattern emitters (Model/Association/Feature/Dataset)
operators/  the SURVEY §2 operator inventory as reusable DataFrame functions
functions/  scalar column-function helpers (text analysis, vectors, hashing)
io/         readers (header-contract CSV/TSV, GFF, XML) and RDF sinks (nt/
            nquads/turtle)
streaming/  Structured-Streaming-native operators (windowed aggs, append sink)
"""

__version__ = "0.1.0"
