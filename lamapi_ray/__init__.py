"""lamapi_ray — a Ray-Data-native knowledge-graph construction engine.

A from-scratch reimplementation of the query / data-processing capabilities of
unimib-datAI/lamAPI (reference at /root/reference, cited per-function as
file:line) re-expressed as batch dataflow over ``ray.data.Dataset``:

* offline KG build   (reference: scripts/parse_wikidata_dump.py, summary.py)
* surface-form index (reference: scripts/elastic_indexing.py)
* candidate generation / entity linking (reference: api/model/...)
* plus large-scale training-data operators (dedup, ANN, text stats)

No module in this package calls ``ray.init()`` — the driver / bench / test
fixture owns the Ray session.
"""

__version__ = "0.1.0"
