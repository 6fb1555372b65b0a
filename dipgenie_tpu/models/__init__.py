from .classifier import KGParams, classify_multiplicity, classify_labels
from .fitter import fit_histogram, KGFitResult
