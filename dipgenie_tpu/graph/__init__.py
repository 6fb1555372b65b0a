from .pangenome import PangenomeIndex
from .expanded import ExpandedGraph
