#!/usr/bin/env perl
# Sun/Univa Grid Engine dispatcher with the Kaldi job-runner calling
# convention (fresh implementation; reference selects the dispatcher via
# $cmd, reference cmd.sh:12-15):
#
#   queue.pl [options] [JOB=1:N] <logfile> <command...>
#
# Submits the command as an SGE array job (qsub -sync y) with JOB
# substituted from $SGE_TASK_ID at run time, logs per task, and returns
# nonzero if any task fails.  Recognized resource options:
#
#   -q <queue>                      queue name
#   --mem <size>                    -l mem_free=<size>,ram_free=<size>
#   --num-threads / --num_threads <n>   -pe smp <n>
#   --gpu <n>                       -l gpu=<n>
#   --max-jobs-run <n>              -tc <n> (array concurrency cap)
#   --config <file>                 ignored (compatibility)
#
# Without `qsub` on PATH the job runs locally through run.pl with the
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
    if ($opt eq "-q" or $opt eq "--queue") {
        $res{queue} = $val;
    } elsif ($opt eq "--mem" or $opt eq "--max-mem") {
        $res{mem} = $val;
    } elsif ($opt eq "--num-threads" or $opt eq "--num_threads") {
        $res{cpus} = $val;
    } elsif ($opt eq "--gpu") {
        $res{gpu} = $val;
    } elsif ($opt eq "--max-jobs-run") {
        $res{maxrun} = $val;
    } elsif ($opt eq "--config") {
        # site config files are a Kaldi-ism we do not replicate
    } else {
        push @passthru, $opt, $val;   # unknown: hand to qsub verbatim
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

die "queue.pl: usage: queue.pl [options] [JOB=1:N] <logfile> <command...>\n"
    unless @ARGV >= 2;

# no scheduler → run locally with identical semantics
my $have_qsub = 0;
for my $dir (split /:/, ($ENV{PATH} || "")) {
    $have_qsub = 1, last if $dir ne "" and -x "$dir/qsub";
}
unless ($have_qsub) {
    warn "queue.pl: qsub not found on PATH; running locally via run.pl\n";
    my @fwd = defined $jobname ? ("$jobname=$jstart:$jend") : ();
    exec("$FindBin::Bin/run.pl", @fwd, @ARGV)
        or die "queue.pl: cannot exec run.pl\n";
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
    $cmd_rt =~ s/\Q$jobname\E/\${SGE_TASK_ID}/g;
    $log_rt =~ s/\Q$jobname\E/\${SGE_TASK_ID}/g;
}
(my $qdir = $logfile) =~ s|/[^/]*$||;
$qdir = "." if $qdir eq $logfile;
$qdir .= "/q";
system("mkdir", "-p", $qdir) == 0 or die "queue.pl: cannot mkdir $qdir\n";
(my $base = $logfile) =~ s|.*/||;
$base =~ s/\.[^.]+$//;
my $script = "$qdir/$base.sh";

open(my $sh, ">", $script) or die "queue.pl: cannot write $script\n";
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

my @qsub = ("qsub", "-sync", "y", "-V", "-cwd", "-b", "n",
            "-o", "/dev/null", "-e", "/dev/null", "-N", $base);
if (defined $jobname or $jend > $jstart) {
    push @qsub, "-t", "$jstart-$jend";
    push @qsub, "-tc", $res{maxrun} if $res{maxrun};
}
push @qsub, "-q", $res{queue} if $res{queue};
push @qsub, "-l", "mem_free=$res{mem},ram_free=$res{mem}" if $res{mem};
push @qsub, "-pe", "smp", $res{cpus} if $res{cpus};
push @qsub, "-l", "gpu=$res{gpu}" if $res{gpu};
push @qsub, @passthru, $script;

my $ret = system(@qsub);
if ($ret != 0) {
    print STDERR "queue.pl: qsub reported failed tasks; see $logfile\n";
    exit 1;
}
exit 0;
