"""namedis_spark — a from-scratch PySpark-native entity-resolution engine.

Re-creates the query/data-processing capabilities of askerlee/namedis
(ECML/PKDD 2012 author-name disambiguation via the CSLR categorical
similarity), retargeted to tables of multi-turn conversation/agent
transcripts (conv_id, turn_idx, role, text, tool, ts).

Pipeline shape (SURVEY.md §7): per-conversation feature extraction →
blocking on normalized keys (salted for skew) → batched pandas-UDF
pairwise scoring (CSLR + Jaro-Winkler + TF-IDF cosine + taxonomy
overlap) → threshold → iterative large-star/small-star connected
components, checkpointed per round for resumability.
"""

__version__ = "0.1.0"
