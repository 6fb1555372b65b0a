from .murmur import murmur3_x64_128_fold64
from .minimizers import sketch_sequence, Minimizers
