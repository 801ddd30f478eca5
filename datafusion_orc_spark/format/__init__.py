"""Container formats.

- ``orc_proto`` / ``orc_reader``: a pure-python ORC v1 reader subset —
  the capability the reference crate provides to DataFusion
  (reference: src/file_format.rs:44-54 schema inference,
  src/physical_exec.rs:57-91 batch decode) re-expressed over numpy +
  pyarrow, used for conformance against the reference's own corpus.
- ``stripe``: our engine's stripe-blob format (encode side; the
  reference has no writer — SURVEY.md §2.1).
"""
