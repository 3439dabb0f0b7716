"""Experiment harness: scripted benchmark/figure reproduction
(reference: experiment_list.c + main.c:1948-2016)."""
