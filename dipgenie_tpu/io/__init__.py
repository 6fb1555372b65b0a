from .gfa import Gfa, read_gfa, write_gfa
from .fastx import read_fastx
from .fasta import write_fasta
