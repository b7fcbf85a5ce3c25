"""Pipeline-framework queries — registered in later build steps.

Exercises PipelineSpec/Scheduler end-to-end (SURVEY §2 C1-C6).
"""
