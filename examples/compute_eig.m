%% Eigenvalues of the exported linearized operators, Matlab side.
% Downstream check of examples/compute_operators.py + convert_npz_to_mat.py:
% shift-invert eigs near the documented targets. Equivalent Matlab workflow
% to ref: src/examples/operators/compute_eig.m, reading this framework's
% export layout via read_coo.m. The Python-side equivalent (no Matlab
% needed) is examples/compute_eigenvalues.py.
clearvars;

% compute_operators.py writes data_output_operators/cylinder_{A,E}.npz;
% convert_npz_to_mat.py turns each into a COO .mat next to it
folder = "data_output_operators";
A = read_coo(fullfile(folder, "cylinder_A.mat"));
E = read_coo(fullfile(folder, "cylinder_E.mat"));

% documented unstable target for cylinder Re=100
% (ref: src/examples/operators/compute_eigenvalues.py:50-51)
targets = [0.1 + 0.8j, 0];
k = 1;

D = [];
for ii = 1:length(targets)
    [~, d] = eigs(A, E, k, targets(ii), "Display", true);
    D = [D; diag(d)]; %#ok<AGROW>
end
D = unique(D);
disp(D)

figure(1); clf; hold on;
plot(D, "r.", "MarkerSize", 12)
plot(conj(D), "b.", "MarkerSize", 12)
xline(0, "k--"); yline(0, "k--"); grid on;
xlabel("\Re"); ylabel("\Im");
title("Cylinder eigenvalues (expect 0.1326 + 0.7700i unstable)")
