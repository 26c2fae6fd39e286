"""Micro-batch CDC tail: deterministic batch ledger + pipeline driver.

The reference's streaming construct is an SQS poll loop with
visibility-timeout leases and ack-after-success (file_loader.py:428-456).
Here the queue is a deterministic micro-batch ledger; exactly-once =
idempotent MERGE + snapshot commits keyed by batch id.
"""
