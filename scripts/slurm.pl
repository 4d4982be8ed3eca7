#!/usr/bin/env perl
# Slurm dispatcher with the Kaldi job-runner calling convention
# (fresh implementation; reference selects the dispatcher via $cmd,
# reference cmd.sh:12-15):
#
#   slurm.pl [options] [JOB=1:N] <logfile> <command...>
#
# Submits the command as a Slurm array job (sbatch --wait) with JOB
# substituted from $SLURM_ARRAY_TASK_ID at run time, logs per task, and
# returns nonzero if any task fails.  Recognized resource options:
#
#   -p / -q / --partition <name>   partition
#   --mem <size>                   memory per task (e.g. 4G)
#   --num-threads / --num_threads <n>  cpus per task
#   --gpu <n>                      --gres=gpu:n
#   --time <limit>                 walltime
#   --max-jobs-run <n>             array concurrency cap (%n)
#   --config <file>                ignored (compatibility)
#
# Without `sbatch` on PATH the job runs locally through run.pl with the
# same semantics (single-machine fallback).
use strict;
use warnings;
use Cwd qw(getcwd);
use FindBin;

my %res;
my @passthru;
while (@ARGV and $ARGV[0] =~ m/^-/) {
    my $opt = shift @ARGV;
    if ($opt eq "-V") { next; }                       # inherit env (default)
    my $val = @ARGV ? shift @ARGV : "";
    if ($opt eq "-p" or $opt eq "-q" or $opt eq "--partition") {
        $res{partition} = $val;
    } elsif ($opt eq "--mem" or $opt eq "--max-mem") {
        $res{mem} = $val;
    } elsif ($opt eq "--num-threads" or $opt eq "--num_threads") {
        $res{cpus} = $val;
    } elsif ($opt eq "--gpu") {
        $res{gpu} = $val;
    } elsif ($opt eq "--time") {
        $res{time} = $val;
    } elsif ($opt eq "--max-jobs-run") {
        $res{maxrun} = $val;
    } elsif ($opt eq "--config") {
        # site config files are a Kaldi-ism we do not replicate
    } else {
        push @passthru, $opt, $val;   # unknown: hand to sbatch verbatim
    }
}

my $jobname;
my ($jstart, $jend) = (1, 1);
if (@ARGV and $ARGV[0] =~ m/^([A-Za-z_][A-Za-z0-9_]*)=(\d+):(\d+)$/) {
    ($jobname, $jstart, $jend) = ($1, $2, $3);
    shift @ARGV;
} elsif (@ARGV and $ARGV[0] =~ m/^([A-Za-z_][A-Za-z0-9_]*)=(\d+)$/) {
    ($jobname, $jstart, $jend) = ($1, $2, $2);
    shift @ARGV;
}

die "slurm.pl: usage: slurm.pl [options] [JOB=1:N] <logfile> <command...>\n"
    unless @ARGV >= 2;

# no scheduler → run locally with identical semantics
my $have_sbatch = 0;
for my $dir (split /:/, ($ENV{PATH} || "")) {
    $have_sbatch = 1, last if $dir ne "" and -x "$dir/sbatch";
}
unless ($have_sbatch) {
    warn "slurm.pl: sbatch not found on PATH; running locally via run.pl\n";
    my @fwd = defined $jobname ? ("$jobname=$jstart:$jend") : ();
    exec("$FindBin::Bin/run.pl", @fwd, @ARGV)
        or die "slurm.pl: cannot exec run.pl\n";
}

my $logfile = shift @ARGV;
# re-quote args containing whitespace (same round-trip rule as run.pl)
my @quoted;
for my $arg (@ARGV) {
    if ($arg =~ m/^\S+$/) { push @quoted, $arg; }
    elsif ($arg =~ m/"/)  { push @quoted, "'" . $arg . "'"; }
    else                  { push @quoted, '"' . $arg . '"'; }
}
my $command = join(" ", @quoted);

# batch script: JOB resolves from the array task id at run time
my $cmd_rt = $command;
my $log_rt = $logfile;
if (defined $jobname) {
    $cmd_rt =~ s/\Q$jobname\E/\${SLURM_ARRAY_TASK_ID}/g;
    $log_rt =~ s/\Q$jobname\E/\${SLURM_ARRAY_TASK_ID}/g;
}
(my $qdir = $logfile) =~ s|/[^/]*$||;
$qdir = "." if $qdir eq $logfile;
$qdir .= "/q";
system("mkdir", "-p", $qdir) == 0 or die "slurm.pl: cannot mkdir $qdir\n";
(my $base = $logfile) =~ s|.*/||;
$base =~ s/\.[^.]+$//;
my $script = "$qdir/$base.sh";

open(my $sh, ">", $script) or die "slurm.pl: cannot write $script\n";
print $sh "#!/bin/bash\n";
print $sh "cd " . quotemeta(getcwd()) . "\n";
print $sh "log=\"$log_rt\"\n";
print $sh "mkdir -p \"\$(dirname \"\$log\")\"\n";
print $sh "echo \"# $cmd_rt\" > \"\$log\"\n";
print $sh "echo \"# started \$(date)\" >> \"\$log\"\n";
print $sh "( $cmd_rt ) >> \"\$log\" 2>&1\n";
print $sh "ret=\$?\n";
print $sh "echo \"# finished \$(date) status \$ret\" >> \"\$log\"\n";
print $sh "exit \$ret\n";
close $sh;
chmod 0755, $script;

my @sbatch = ("sbatch", "--wait", "--export=ALL", "--output=/dev/null",
              "--job-name=$base");
my $array = "$jstart-$jend";
$array .= "%$res{maxrun}" if $res{maxrun};
push @sbatch, "--array=$array" if defined $jobname or $jend > $jstart;
push @sbatch, "--partition=$res{partition}" if $res{partition};
push @sbatch, "--mem=$res{mem}"             if $res{mem};
push @sbatch, "--cpus-per-task=$res{cpus}"  if $res{cpus};
push @sbatch, "--gres=gpu:$res{gpu}"        if $res{gpu};
push @sbatch, "--time=$res{time}"           if $res{time};
push @sbatch, @passthru, $script;

my $ret = system(@sbatch);
if ($ret != 0) {
    print STDERR "slurm.pl: sbatch reported failed tasks; see $logfile\n";
    exit 1;
}
exit 0;
