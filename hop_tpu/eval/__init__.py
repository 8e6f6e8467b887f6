"""Evaluation: FGD, beat consistency, diversity, joint MAE."""
