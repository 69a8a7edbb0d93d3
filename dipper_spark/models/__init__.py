"""Triple-pattern emitter library ("models" layer).

Reference: dipper's model classes are macro libraries that emit 1-N canned
triples per call (dipper/models/Model.py:10-14, Association.py:94-163,
GenomicFeature.py:127-231, Genotype.py:36-657, Evidence.py:32-156,
Provenance.py:32-105, Dataset.py:245-339).  Here each emitter is a pure
function ``DataFrame[entities] -> DataFrame[triples]`` built from
select/union/explode only — no Python row UDFs, fully codegen-friendly.
"""

from dipper_spark.models.model import (
    class_triples,
    comment_triples,
    deprecation_triples,
    entity_triples,
    individual_triples,
    membership_triples,
    pairwise_triples,
    restriction_triples,
    synonym_triples,
    xref_triples,
)
from dipper_spark.models.assoc import (
    association_triples,
    d2p_association_triples,
    g2p_association_triples,
    interaction_triples,
    orthology_triples,
)
from dipper_spark.models.feature import feature_triples
from dipper_spark.models.genotype import (
    affected_locus_triples,
    genotype_part_triples,
    taxon_triples,
    vslc_triples,
)
from dipper_spark.models.sepio import evidence_triples, provenance_triples
from dipper_spark.models.dataset import dataset_metadata_triples, hcls_dataset_triples
from dipper_spark.models.context import (
    environment_triples,
    environmental_condition_triples,
    family_triples,
    reference_triples,
)

__all__ = [
    "association_triples",
    "class_triples",
    "environment_triples",
    "environmental_condition_triples",
    "family_triples",
    "reference_triples",
    "d2p_association_triples",
    "dataset_metadata_triples",
    "hcls_dataset_triples",
    "deprecation_triples",
    "entity_triples",
    "evidence_triples",
    "feature_triples",
    "g2p_association_triples",
    "genotype_part_triples",
    "comment_triples",
    "individual_triples",
    "interaction_triples",
    "membership_triples",
    "orthology_triples",
    "pairwise_triples",
    "restriction_triples",
    "provenance_triples",
    "synonym_triples",
    "vslc_triples",
    "xref_triples",
]
