"""Model layer: observation containers, mean functions, and the GP core
(likelihood + prediction + inference drivers).

Counterpart of the reference's ``gptools/core.py`` + ``gptools/mean.py``
(SURVEY.md sections 1-3).
"""
