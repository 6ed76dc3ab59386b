"""Source connectors (Parquet today; see parquet.py for the layout
contract and the 100 TB partitioning design notes)."""
