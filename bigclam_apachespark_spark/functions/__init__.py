from bigclam_apachespark_spark.functions.arrays import (
    arr_dot,
    arr_axpy,
    arr_clamp,
    arr_lit,
    prob_hat,
    cosine_sim,
)

__all__ = ["arr_dot", "arr_axpy", "arr_clamp", "arr_lit", "prob_hat", "cosine_sim"]
