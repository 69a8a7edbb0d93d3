"""Per-source ingest pipelines (SURVEY.md §2.11, §7 M2-M6).

Importing this package registers every pipeline in ``REGISTRY`` — the analog
of dipper-etl.py's source_to_class_map (dipper-etl.py:20-62).
"""

from dipper_spark.sources.base import (
    REGISTRY,
    FileContract,
    SourcePipeline,
    get_pipeline,
    register,
    run_sources,
)
from dipper_spark.sources.hpoa import HpoaPipeline
from dipper_spark.sources.ctd import CtdPipeline
from dipper_spark.sources.geneontology import GeneOntologyPipeline
from dipper_spark.sources.stringdb import StringDbPipeline
from dipper_spark.sources.bgee import BgeePipeline
from dipper_spark.sources.ucscbands import UcscBandsPipeline
from dipper_spark.sources.clinvar import ClinVarPipeline
from dipper_spark.sources.mgi import MgiPipeline
from dipper_spark.sources.panther import PantherPipeline
from dipper_spark.sources.gwascatalog import GwasCatalogPipeline
from dipper_spark.sources.mpd import MpdPipeline
from dipper_spark.sources.ncbigene import NcbiGenePipeline
from dipper_spark.sources.impc import ImpcPipeline
from dipper_spark.sources.reactome import ReactomePipeline
from dipper_spark.sources.animalqtldb import AnimalQtldbPipeline
from dipper_spark.sources.orphanet import OrphanetPipeline
from dipper_spark.sources.omim import OmimPipeline
from dipper_spark.sources.zfin import ZfinPipeline
from dipper_spark.sources.udp import UdpPipeline
from dipper_spark.sources.biogrid import BioGridPipeline
from dipper_spark.sources.kegg import KeggPipeline
from dipper_spark.sources.coriell import CoriellPipeline
from dipper_spark.sources.hgnc import HgncPipeline
from dipper_spark.sources.mychem import MyChemPipeline
from dipper_spark.sources.ensembl import EnsemblPipeline
from dipper_spark.sources.sgd import SgdPipeline
from dipper_spark.sources.omia import OmiaPipeline
from dipper_spark.sources.wormbase import WormBasePipeline
from dipper_spark.sources.rgd import RgdPipeline
from dipper_spark.sources.xenbase import XenbasePipeline
from dipper_spark.sources.flybase import FlyBasePipeline
from dipper_spark.sources.slim import MgiSlimPipeline, ZfinSlimPipeline
from dipper_spark.sources.monarch import MonarchPipeline
from dipper_spark.sources.eom import EomPipeline
from dipper_spark.sources.genereviews import GeneReviewsPipeline
from dipper_spark.sources.ebi_g2p import EbiGene2PhenPipeline
from dipper_spark.sources.decipher import DecipherPipeline
from dipper_spark.sources.mydrug import MyDrugPipeline
from dipper_spark.sources.mmrrc import MmrrcPipeline
from dipper_spark.sources.monochrom import MonochromPipeline

__all__ = [
    "OmiaPipeline",
    "WormBasePipeline",
    "RgdPipeline",
    "XenbasePipeline",
    "FlyBasePipeline",
    "MgiSlimPipeline",
    "ZfinSlimPipeline",
    "MonarchPipeline",
    "EomPipeline",
    "GeneReviewsPipeline",
    "EbiGene2PhenPipeline",
    "DecipherPipeline",
    "MyDrugPipeline",
    "MmrrcPipeline",
    "MonochromPipeline",
    "UcscBandsPipeline",
    "BgeePipeline",
    "GeneOntologyPipeline",
    "StringDbPipeline",
    "REGISTRY",
    "FileContract",
    "SourcePipeline",
    "get_pipeline",
    "register",
    "run_sources",
    "HpoaPipeline",
    "CtdPipeline",
    "NcbiGenePipeline",
    "ImpcPipeline",
    "ReactomePipeline",
    "AnimalQtldbPipeline",
    "OrphanetPipeline",
    "OmimPipeline",
    "ZfinPipeline",
    "UdpPipeline",
    "BioGridPipeline",
    "KeggPipeline",
    "CoriellPipeline",
    "HgncPipeline",
    "MyChemPipeline",
    "EnsemblPipeline",
    "SgdPipeline",
]
