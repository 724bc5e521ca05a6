"""Dash dashboard comparing TD3 runs with/without the steering-shift
domain-randomization experiment.

Equivalent of the reference's examples/domain_randomization/dash_app
(reference: dash_app/main.py, pages/layout_utils.py:19-100): rolling-mean
plots of critic/actor losses, episodic reward, CTE, and laneline
distances, read from the CSVs written by
`tinycarlo_tpu.train.logging.save_losses/save_rewards/save_series`
(run examples/train_td3.py with and without --shift first).

Usage: python examples/domain_randomization/dash_app.py [data_dir]
"""
import os
import sys


def load_series(data_dir, name):
    import pandas as pd

    out = {}
    for suffix in ("with_shift", "without_shift"):
        path = os.path.join(data_dir, f"{name}_{suffix}.csv")
        if os.path.exists(path):
            out[suffix] = pd.read_csv(path)
    # also accept un-suffixed files
    path = os.path.join(data_dir, f"{name}.csv")
    if not out and os.path.exists(path):
        out["run"] = pd.read_csv(path)
    return out


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
    sections = []
    for name, col, title in (
        ("critic_loss", "Critic 1 Loss", "Critic loss"),
        ("actor_loss", "Loss", "Actor loss"),
        ("rew", "Reward", "Episodic reward"),
        ("cte", "cte", "Cross-track error"),
        ("outer", "outer", "Distance to outer laneline"),
        ("dashed", "dashed", "Distance to dashed laneline"),
        ("solid", "solid", "Distance to solid laneline"),
    ):
        frames = load_series(data_dir, name)
        if frames:
            sections.append(html.H3(title))
            sections.append(dcc.Graph(figure=rolling_figure(frames, col, title)))
    if not sections:
        sections = [html.P(f"no CSVs found in {data_dir}")]
    app.layout = html.Div(
        [html.H1("tinycarlo-tpu domain randomization"), *sections]
    )
    app.run(debug=False)


if __name__ == "__main__":
    main()
