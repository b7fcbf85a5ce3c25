"""LLM-scale data-pipeline queries — registered in later build steps.

Populated by operators/{dedup,similarity,text}.py wrappers.
"""
