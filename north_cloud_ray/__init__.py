"""north_cloud_ray — a Ray-Data-native rebuild of north-cloud's crawl tier.

A from-scratch distributed URL-frontier + fetch + parse + classify engine
expressed as ``ray.data.Dataset`` pipelines over zero-copy Arrow batches,
with actor pools for the stateful stages (politeness, robots cache,
URL-seen set). Reference behavior: jonesrussell/north-cloud (see SURVEY.md;
file:line citations in docstrings point into /root/reference).

Nothing in this package calls ``ray.init()`` — the driver / bench / test
fixture owns the Ray session.
"""

__version__ = "0.1.0"
