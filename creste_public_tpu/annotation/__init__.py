"""Human-in-the-loop counterfactual annotation (SURVEY L10).

Port of scripts/traversability/rlhf (Flask app on :4242) + planner_utils
samplers: candidate counterfactual trajectories around the expert, ranked
by a human, written as counterfactuals/{seq}/{frame}.pkl for stage-3
counterfactual IRL. The web app uses the stdlib http.server (flask is not
in the image) with the same /load and /save JSON contract.
"""
