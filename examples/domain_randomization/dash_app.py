"""Dash dashboard comparing TD3 runs with/without the steering-shift
domain-randomization experiment.

Equivalent of the reference's examples/domain_randomization/dash_app
(reference: dash_app/main.py, pages/layout_utils.py:19-100,
pages/lenkwinkel/lenkwinkel_mit_shift.py / lenkwinkel_ohne_shift.py):

  * a "with shift" and a "without shift" page (tabs), each with the full
    per-run plot set -- rolling-mean laneline distances, critic/actor
    losses, episodic reward, CTE, and per-layer weight-change plots for
    actor/critic1/critic2 (color-grouped by module family like the
    reference's color_discrete_map);
  * a comparison page overlaying both runs per metric.

Data comes from the CSVs written by `tinycarlo_tpu.train.logging`
(run `examples/train_td3.py` and `examples/train_td3.py --shift` with the
same TD3_OUT first).

Usage: python examples/domain_randomization/dash_app.py [data_dir]
"""
import os
import sys

SUFFIXES = ("with_shift", "without_shift")
METRICS = (
    # (csv base name, value column, title)
    ("outer", "outer", "Outer distance"),
    ("dashed", "dashed", "Dashed distance"),
    ("solid", "solid", "Solid distance"),
    ("hold", "hold", "Hold-line distance"),
    ("area", "area", "Area distance"),
    ("critic_loss", "Critic 1 Loss", "Critic loss"),
    ("actor_loss", "Loss", "Actor loss"),
    ("rew", "Reward", "Episodic reward"),
    ("cte", "cte", "Cross-track error"),
)
WEIGHT_NETS = ("actor", "critic1", "critic2")

# family coloring like the reference (pages/layout_utils.py:55-66): conv
# red, maneuver-trunk blue, head/critic-mlp green
_FAMILY_COLORS = (("Conv", "red"), ("fcm", "blue"), ("fc", "green"))


def _csv(data_dir, name, suffix):
    import pandas as pd

    path = os.path.join(data_dir, f"{name}_{suffix}.csv")
    if os.path.exists(path):
        return pd.read_csv(path)
    path = os.path.join(data_dir, f"{name}.csv")
    return pd.read_csv(path) if os.path.exists(path) else None


def _layer_color(layer):
    for token, color in _FAMILY_COLORS:
        if token in layer:
            return color
    return None


def rolling_figure(frames, value_col, title, window=100):
    import plotly.graph_objects as go

    fig = go.Figure()
    for label, df in frames.items():
        col = value_col if value_col in df.columns else df.columns[-1]
        fig.add_trace(
            go.Scatter(
                y=df[col].rolling(window, min_periods=1).mean(),
                name=label,
                mode="lines",
            )
        )
    fig.update_layout(title=title, xaxis_title="Step", yaxis_title=value_col)
    return fig


def weight_change_figure(df, title):
    """Per-layer weight-change lines from the long-format CSV
    (Step, Layer, Mean Absolute Weight Change)."""
    import plotly.graph_objects as go

    fig = go.Figure()
    for layer, grp in df.groupby("Layer"):
        fig.add_trace(
            go.Scatter(
                x=grp["Step"],
                y=grp["Mean Absolute Weight Change"],
                name=layer,
                mode="lines",
                line={"color": _layer_color(layer)},
            )
        )
    fig.update_layout(
        title=title, xaxis_title="Step",
        yaxis_title="Mean Absolute Weight Change",
    )
    return fig


def run_page(data_dir, suffix, html, dcc):
    """The per-run page (reference pages/lenkwinkel_*_shift.py layout)."""
    sections = [html.H2(suffix.replace("_", " "))]
    graphs = []
    for name, col, title in METRICS:
        df = _csv(data_dir, name, suffix)
        if df is not None:
            graphs.append(
                dcc.Graph(figure=rolling_figure({suffix: df}, col, title))
            )
    for net in WEIGHT_NETS:
        df = _csv(data_dir, f"{net}_weight_changes", suffix)
        if df is not None:
            graphs.append(
                dcc.Graph(
                    figure=weight_change_figure(
                        df, f"{net} weight changes"
                    )
                )
            )
    if not graphs:
        graphs = [html.P(f"no CSVs for {suffix} in {data_dir}")]
    return html.Div(sections + graphs)


def comparison_page(data_dir, html, dcc):
    sections = [html.H2("with vs without shift")]
    graphs = []
    for name, col, title in METRICS:
        frames = {}
        for suffix in SUFFIXES:
            df = _csv(data_dir, name, suffix)
            if df is not None:
                frames[suffix] = df
        if frames:
            graphs.append(dcc.Graph(figure=rolling_figure(frames, col, title)))
    if not graphs:
        graphs = [html.P(f"no CSVs found in {data_dir}")]
    return html.Div(sections + graphs)


def main():
    try:
        import dash
        from dash import dcc, html
    except ImportError:
        print(
            "dash is not installed; install dash/plotly/pandas to use the "
            "dashboard. The underlying CSVs are plain files in the data dir."
        )
        return

    data_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/td3_run"
    app = dash.Dash(__name__)
    app.layout = html.Div(
        [
            html.H1("tinycarlo-tpu domain randomization"),
            dcc.Tabs(
                [
                    dcc.Tab(
                        label="comparison",
                        children=[comparison_page(data_dir, html, dcc)],
                    ),
                    dcc.Tab(
                        label="with shift",
                        children=[run_page(data_dir, "with_shift", html, dcc)],
                    ),
                    dcc.Tab(
                        label="without shift",
                        children=[
                            run_page(data_dir, "without_shift", html, dcc)
                        ],
                    ),
                ]
            ),
        ]
    )
    app.run(debug=False)


if __name__ == "__main__":
    main()
