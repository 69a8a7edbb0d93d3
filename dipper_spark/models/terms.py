"""Vocabulary term CURIEs used by the model emitters.

These mirror the globaltt labels dipper resolves at emit time
(translationtable/GLOBAL_TERMS.yaml via RDFGraph.py:29-34; usage in
dipper/models/Model.py, Association.py, GenomicFeature.py, Genotype.py).
Held as plain constants: they are data, folded into codegen literals.
"""

# core RDF/OWL (Model.py object_properties/annotation maps)
TYPE = "rdf:type"
LABEL = "rdfs:label"
SUBCLASS_OF = "rdfs:subClassOf"
COMMENT = "rdfs:comment"
SAME_AS = "owl:sameAs"
DIFFERENT_FROM = "owl:differentFrom"
EQUIVALENT_CLASS = "owl:equivalentClass"
DEPRECATED = "owl:deprecated"
CLASS = "owl:Class"
NAMED_INDIVIDUAL = "owl:NamedIndividual"
RESTRICTION = "owl:Restriction"
ON_PROPERTY = "owl:onProperty"
SOME_VALUES_FROM = "owl:someValuesFrom"

# annotation vocabulary (Model.py:10-14 canned patterns)
DEFINITION = "IAO:0000115"
REPLACED_BY = "IAO:0100001"
CONSIDER = "OIO:consider"
HAS_DBXREF = "OIO:hasDbXref"
HAS_EXACT_SYNONYM = "OIO:hasExactSynonym"
HAS_RELATED_SYNONYM = "OIO:hasRelatedSynonym"
DESCRIPTION = "dc:description"
SOURCE = "dc:source"
DATE = "dc:date"
CREATED_ON = "pav:createdOn"
DEPICTION = "foaf:depiction"
PAGE = "foaf:page"
CLIQUE_LEADER = "MONARCH:cliqueLeader"

# OBAN reified-association vocabulary (Association.py:94-163)
ASSOCIATION = "OBAN:association"
ASSOC_SUBJECT = "OBAN:association_has_subject"
ASSOC_PREDICATE = "OBAN:association_has_predicate"
ASSOC_OBJECT = "OBAN:association_has_object"
HAS_EVIDENCE = "RO:0002558"
SCORE = "SIO:000300"

# D2P / G2P qualifiers (D2PAssoc.py:58-105, G2PAssoc.py:74-138)
ONSET = "RO:0002488"
FREQUENCY = "RO:0003306"
HAS_QUALIFIER = "GENO:0000580"
PATHOGENICITY = "GENO:0000840"

# orthology / interaction (OrthologyAssoc.py:10-45, InteractionAssoc.py:8-30)
ORTHOLOGOUS_TO = "RO:HOM0000017"
PARALOGOUS_TO = "RO:HOM0000011"
INTERACTS_WITH = "RO:0002434"
MEMBER_OF = "RO:0002350"
GENE_FAMILY = "DATA:3148"

# FALDO (GenomicFeature.py:26-52,127-231)
FALDO_LOCATION = "faldo:location"
FALDO_REGION = "faldo:Region"
FALDO_BEGIN = "faldo:begin"
FALDO_END = "faldo:end"
FALDO_POSITION_PROP = "faldo:position"
FALDO_REFERENCE = "faldo:reference"
FALDO_EXACT = "faldo:ExactPosition"
FALDO_POSITION_CLS = "faldo:Position"  # generic position (strand unknown)
SO_REGION = "SO:0000001"  # a located feature with no coordinates IS a region
FALDO_FORWARD = "faldo:ForwardStrandPosition"
FALDO_REVERSE = "faldo:ReverseStrandPosition"
FALDO_BOTH = "faldo:BothStrandsPosition"
FALDO_STRANDED = "faldo:StrandedPosition"

# GENO genotype partonomy (Genotype.py:36-657)
INTRINSIC_GENOTYPE = "GENO:0000000"
HAS_VARIANT_PART = "GENO:0000382"
HAS_REFERENCE_PART = "GENO:0000385"
HAS_ZYGOSITY = "GENO:0000608"
GENOMIC_BACKGROUND = "GENO:0000611"
# zygosity classes (GLOBAL_TERMS.yaml:183-210)
HEMIZYGOUS = "GENO:0000134"
HETEROZYGOUS = "GENO:0000135"
HOMOZYGOUS = "GENO:0000136"
INDETERMINATE = "GENO:0000137"
COMPOUND_HETEROZYGOUS = "GENO:0000402"
SIMPLE_HETEROZYGOUS = "GENO:0000458"
VSLC = "GENO:0000030"
VARIANT_LOCUS = "GENO:0000002"
SEQUENCE_ALTERATION = "SO:0001059"
HAS_AFFECTED_FEATURE = "GENO:0000418"
IN_TAXON = "RO:0002162"
HAS_PART = "BFO:0000051"
PART_OF = "BFO:0000050"

# SEPIO evidence/provenance (Evidence.py:32-156, Provenance.py:32-105)
HAS_SUPPORTING_EVIDENCE = "SEPIO:0000007"
IS_EVIDENCE_FOR = "SEPIO:0000084"
HAS_SUPPORTING_DATA = "SEPIO:0000084_data"
ASSERTION = "SEPIO:0000001"
IS_ASSERTED_IN = "SEPIO:0000015"
CREATED_BY = "SEPIO:0000018"
EVIDENCE_LINE = "SEPIO:0000002"

# HCLS dataset metadata (Dataset.py:19-164)
DCTYPES_DATASET = "dctypes:Dataset"
DC_TITLE = "dc:title"
DC_PUBLISHER = "dc:Publisher"
DC_CREATED = "dc:created"
DC_VERSION = "pav:version"
VOID_TRIPLES = "void:triples"
VOID_DISTINCT_SUBJECTS = "void:distinctSubjects"
VOID_DISTINCT_OBJECTS = "void:distinctObjects"
VOID_PROPERTIES = "void:properties"
VOID_DATA_DUMP = "void:dataDump"
# full HCLS stanza terms (Dataset.py:245-340, GLOBAL_TERMS.yaml:33-77,469-471)
DC_PUBLISHER_CLS = "dc:Publisher"
DC_IDENTIFIER = "dc:identifier"
DC_SOURCE = "dc:source"
DC_CREATOR = "dc:creator"
DC_IS_VERSION_OF = "dc:isVersionOf"
DC_FORMAT = "dc:format"
DC_LICENSE = "dc:license"
DC_RIGHTS = "dc:rights"
PAV_VERSION = "pav:version"
PAV_CREATED_WITH = "pav:createdWith"
PAV_RETRIEVED_ON = "pav:retrievedOn"
DCAT_DISTRIBUTION = "dcat:distribution"
DCAT_DISTRIBUTION_CLS = "dcat:Distribution"
DCAT_DOWNLOAD_URL = "dcat:downloadURL"
SCHEMA_LOGO = "schema:logo"
OWL_ONTOLOGY = "owl:Ontology"
OWL_VERSION_IRI = "owl:versionIRI"
CITES_AS_AUTHORITY = "cito:citesAsAuthority"
