"""lingvo_spark_kg — PySpark-native knowledge-graph construction pipeline.

Brand-new engine with the text-processing capabilities of
zamgi/lingvo--PosTagger-NER-ru-dnn (Russian tokenization → word-ending features →
sequence tagging), re-expressed Spark-first as a distributed triple factory over
interleaved text+media document tables. See SURVEY.md for the operator inventory.
"""

__version__ = "0.1.0"
