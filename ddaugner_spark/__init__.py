"""ddaugner_spark — a PySpark-native knowledge-graph construction engine.

Re-expresses the semantics of the CompNet/ddaugNER reference
(dictionary-augmented NER → mention detection → triple extraction →
entity linking → canonicalization → partitioned materialization) as
idiomatic Spark DataFrame pipelines designed for 100 TB-scale inputs.

Nothing here is a port: the reference is eager single-process Python over
``List[NERSentence]``; this engine declares lazy DataFrame plans and lets
Catalyst/AQE pick physical strategies.  Per-operator provenance citations
(``file:line`` into /root/reference) live in each module docstring.
"""

__version__ = "0.1.0"
