"""Structured Streaming tier.

The reference has no streams (SURVEY.md section 2.5); its two
stream-shaped constructs -- the append-only changelog and the
sliding-window quota tracker -- are re-expressed here on real
Structured Streaming: file-source readStream, watermarked tumbling
windows, and applyInPandasWithState for the sequential admit/record
quota semantics Catalyst cannot express declaratively.
"""
