"""CURIE <-> IRI expansion/contraction over a broadcast prefix map.

Reference: dipper/utils/CurieUtil.py:31-67 (get_uri / get_curie /
get_curie_prefix with longest-prefix caveat) and the prefix table
dipper/curie_map.yaml loaded by dipper/curie_map.py:17-30.

Spark-first design: the prefix map is tiny and static → it becomes either a
literal MapType expression (constant-folded, no shuffle, no UDF) or a CASE
chain for contraction.  At 100 TB this is the textbook broadcast-dim pattern:
the map rides inside the task binary, zero network cost per row.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column
from pyspark.sql import functions as F

#: a representative subset of dipper/curie_map.yaml (the real map is data, not
#: code — pipelines pass their own); '_' is the bnode pseudo-prefix.
DEFAULT_CURIE_MAP = {
    "": "https://monarchinitiative.org/",
    "_": "https://monarchinitiative.org/.well-known/genid/",
    "MONARCH": "https://monarchinitiative.org/MONARCH_",
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "owl": "http://www.w3.org/2002/07/owl#",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
    "dc": "http://purl.org/dc/terms/",
    "foaf": "http://xmlns.com/foaf/0.1/",
    "faldo": "http://biohackathon.org/resource/faldo#",
    "OBO": "http://purl.obolibrary.org/obo/",
    "OIO": "http://www.geneontology.org/formats/oboInOwl#",
    "HP": "http://purl.obolibrary.org/obo/HP_",
    "MP": "http://purl.obolibrary.org/obo/MP_",
    "GO": "http://purl.obolibrary.org/obo/GO_",
    "NCBITaxon": "http://purl.obolibrary.org/obo/NCBITaxon_",
    "NCBIGene": "https://www.ncbi.nlm.nih.gov/gene/",
    "OMIM": "https://omim.org/entry/",
    "MGI": "http://www.informatics.jax.org/accession/MGI:",
    "ZFIN": "http://zfin.org/",
    "ClinVar": "http://www.ncbi.nlm.nih.gov/clinvar/",
    "dbSNP": "https://www.ncbi.nlm.nih.gov/projects/SNP/snp_ref.cgi?rs=",
    "STRING": "https://string-db.org/network/",
    "UniProtKB": "http://identifiers.org/uniprot/",
    "ECO": "http://purl.obolibrary.org/obo/ECO_",
    "RO": "http://purl.obolibrary.org/obo/RO_",
    "GENO": "http://purl.obolibrary.org/obo/GENO_",
    "SEPIO": "http://purl.obolibrary.org/obo/SEPIO_",
    "biolink": "https://w3id.org/biolink/vocab/",
    # vocab used by the model emitters (dipper/curie_map.yaml entries)
    "OBAN": "http://purl.org/oban/",
    "IAO": "http://purl.obolibrary.org/obo/IAO_",
    "SIO": "http://semanticscience.org/resource/SIO_",
    "PATO": "http://purl.obolibrary.org/obo/PATO_",
    "BFO": "http://purl.obolibrary.org/obo/BFO_",
    "SO": "http://purl.obolibrary.org/obo/SO_",
    "UBERON": "http://purl.obolibrary.org/obo/UBERON_",
    "DOID": "http://purl.obolibrary.org/obo/DOID_",
    "MESH": "http://id.nlm.nih.gov/mesh/",
    "PMID": "http://www.ncbi.nlm.nih.gov/pubmed/",
    "ISBN-13": "https://monarchinitiative.org/ISBN13_",
    "ORPHA": "http://www.orpha.net/ORDO/Orphanet_",
    "DECIPHER": "https://decipher.sanger.ac.uk/syndrome/",
    "ENSEMBL": "http://identifiers.org/ensembl/",
    "WormBase": "https://www.wormbase.org/get?name=",
    "FlyBase": "http://flybase.org/reports/",
    "GO_REF": "http://www.geneontology.org/cgi-bin/references.cgi#GO_REF:",
    "REACT": "http://www.reactome.org/PathwayBrowser/#/",
    "DATA": "http://edamontology.org/data_",
    "ClinVarVariant": "http://www.ncbi.nlm.nih.gov/clinvar/variation/",
    "UCSC": "ftp://hgdownload.soe.ucsc.edu/goldenPath/",
    "PANTHER": "http://www.pantherdb.org/panther/family.do?clsAccession=",
    # dataset metadata vocabularies (dipper/models/Dataset.py)
    "void": "http://rdfs.org/ns/void#",
    "pav": "http://purl.org/pav/",
    "dcat": "http://www.w3.org/ns/dcat#",
    "dctypes": "http://purl.org/dc/dcmitype/",
    "cito": "http://purl.org/spar/cito/",
}


class CurieMap:
    """Column-function CURIE expander/contracter over a static prefix map."""

    def __init__(self, mapping: dict[str, str] | None = None):
        self.mapping = dict(mapping or DEFAULT_CURIE_MAP)
        if len(set(self.mapping.values())) != len(self.mapping):
            # reference warns the same (CurieUtil.py:20-26)
            import logging

            logging.getLogger(__name__).warning("Curie map is NOT one to one!")

    def _map_expr(self) -> Column:
        return F.create_map(
            *chain.from_iterable((F.lit(k), F.lit(v)) for k, v in self.mapping.items())
        )

    def expand(self, col: Column | str) -> Column:
        """CURIE -> IRI (reference: CurieUtil.get_uri, CurieUtil.py:60-67).

        Already-absolute IRIs (http/https/ftp scheme) pass through; unknown
        prefixes yield NULL (the reference logs an error and returns None).
        """
        c = F.col(col) if isinstance(col, str) else col
        prefix = F.split(c, ":").getItem(0)
        # everything after the FIRST ':' (locals may themselves contain ':')
        local = F.substr(c, F.instr(c, F.lit(":")) + F.lit(1), F.length(c))
        base = self._map_expr()[prefix]
        return (
            F.when(F.lower(prefix).isin("http", "https", "ftp"), c)
            .when(base.isNotNull(), F.concat(base, local))
            .otherwise(F.lit(None))
        )

    def contract(self, col: Column | str) -> Column:
        """IRI -> CURIE via longest-prefix match (reference:
        CurieUtil.get_curie/get_curie_prefix, CurieUtil.py:36-51 — which does
        *first* match and comments "no... need the longest match"; we do the
        longest match it wished for)."""
        c = F.col(col) if isinstance(col, str) else col
        expr = F.lit(None).cast("string")
        # each when() wraps the previous as its otherwise, so the LAST-added
        # branch is evaluated first — iterate ascending so the longest base
        # IRI ends up outermost (longest-prefix-match wins)
        for prefix, base in sorted(self.mapping.items(), key=lambda kv: len(kv[1])):
            expr = F.when(
                c.startswith(base),
                F.concat_ws(":", F.lit(prefix), F.substr(c, F.lit(len(base) + 1), F.length(c))),
            ).otherwise(expr)
        return expr
