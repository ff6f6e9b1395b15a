"""Spark ML pipeline: impute → rebalance → assemble → scale → train → evaluate → gate."""
