"""Compatibility re-export: the NLP types live in
:mod:`smooth_feedback_tpu.nlp` (top level, so solvers and ocp can both
import them without a package cycle)."""

from ..nlp import NLP, HessianNLP, NLPSolution, NLPSolutionStatus, with_hessians

__all__ = ["NLP", "HessianNLP", "NLPSolution", "NLPSolutionStatus", "with_hessians"]
