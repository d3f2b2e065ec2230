"""Recipe / Workflow layer — the reference's pipeline-composition
contract, lazily re-expressed.

Reference: ``Step = Callable[[pd.DataFrame], pd.DataFrame]`` closures
sequenced by ``Recipe.add_step/bake`` with ``on_step`` shape callbacks
(``src/tsforge/workflows/recipe.py:6,29-101``); the fluent ``Workflow``
builder producing a plain config dict (``workflows/workflow.py:464-517``);
``WorkflowManager.cross_validation`` orchestration
(``workflows/manager.py:432-525``).

Spark twist: a Step is ``Callable[[DataFrame], DataFrame]`` and ``bake``
is pure plan composition — nothing executes until an action, so the whole
recipe optimizes as ONE Catalyst plan (the reference copies the frame at
every step boundary, ``recipe.py:82``).  Callbacks therefore report plan
schema, not row counts, unless ``eager=True`` (debug mode — counts force
jobs, never use on the hot path)."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

Step = Callable[[DataFrame], DataFrame]


class Recipe:
    def __init__(self, name: str = "recipe"):
        self.name = name
        self._steps: list[tuple[str, Step]] = []

    def add_step(self, step: Step, name: str | None = None) -> "Recipe":
        self._steps.append((name or f"step_{len(self._steps)}", step))
        return self

    def bake(
        self,
        df: DataFrame,
        on_step: Callable[[str, DataFrame], None] | None = None,
        eager: bool = False,
    ) -> DataFrame:
        out = df
        for name, step in self._steps:
            out = step(out)
            if on_step is not None:
                on_step(name, out)
            if eager:
                out = out.localCheckpoint()  # debug: materialize per step
        return out


@dataclass
class Workflow:
    """Fluent builder → plain config dict (``workflow.py:464-517``)."""

    name: str
    model: str = "naive_mean"
    params: dict = field(default_factory=dict)
    lags: list[int] = field(default_factory=list)
    recipe: Recipe | None = None
    horizon: int = 7
    freq: str = "1d"

    def with_model(self, model: str, **params) -> "Workflow":
        self.model = model
        self.params = params
        return self

    def with_lags(self, lags: list[int]) -> "Workflow":
        self.lags = lags
        return self

    def use_recipe(self, recipe: Recipe) -> "Workflow":
        self.recipe = recipe
        return self

    def build(self) -> dict:
        return {
            "name": self.name,
            "model": self.model,
            "params": self.params,
            "lags": self.lags,
            "recipe": self.recipe,
            "horizon": self.horizon,
            "freq": self.freq,
        }


class WorkflowManager:
    """Rolling-origin CV across workflows (``manager.py:432-525``).

    The reference fans workflows out across threads; here each workflow
    is a lazy plan and Spark schedules the union's stages — no manual
    concurrency.  Models are intentionally simple baselines (the
    reference delegates real fitting to Nixtla, out of engine scope —
    SURVEY §2.9 STL note): ``naive_mean`` (mean of last w obs) and
    ``naive_last`` (last value).
    """

    def __init__(self, id_col="unique_id", time_col="ds", target_col="y"):
        self.id_col, self.time_col, self.target_col = id_col, time_col, target_col
        self.last_cv_preds: DataFrame | None = None

    def _predict(self, train: DataFrame, wf: dict, cutoff) -> DataFrame:
        from pyspark.sql import functions as F

        from tsforge_spark.operators.cv import naive_last_window_mean

        window = wf["params"].get("window", 7 if wf["model"] == "naive_mean" else 1)
        preds = naive_last_window_mean(
            train, self.id_col, self.time_col, self.target_col,
            window, wf["horizon"], wf["freq"],
        )
        return preds.withColumn("cutoff", F.lit(cutoff)).withColumn(
            "workflow", F.lit(wf["name"])
        ).withColumn("model", F.lit(wf["model"]))

    def cross_validation(
        self, df: DataFrame, workflows: list[dict], n_windows: int = 3,
        step_days: int = 7,
    ) -> DataFrame:
        from pyspark.sql import functions as F

        from tsforge_spark.operators.cv import cv_cutoffs, train_split

        out = None
        cutoffs = cv_cutoffs(df, self.time_col, n_windows, step_days)
        truth = df.select(self.id_col, self.time_col, self.target_col)
        for wf in workflows:
            baked = wf["recipe"].bake(df) if wf.get("recipe") else df
            for co in cutoffs:
                train = train_split(baked, self.time_col, co)
                preds = self._predict(train, wf, co)
                out = preds if out is None else out.unionByName(preds)
        # left-join truth on (id, ts) (``nixtla_demo.py:628-629``)
        out = out.join(truth, [self.id_col, self.time_col], "left").withColumn(
            "engine", F.lit("tsforge_spark")
        )
        self.last_cv_preds = out
        return out
